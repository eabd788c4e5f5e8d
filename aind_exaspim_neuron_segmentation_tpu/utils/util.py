"""Filesystem + GCS listing helpers.

Surface parity with reference utils/util.py:18-136 (mkdir/rmdir and the
google-cloud-storage bucket enumeration used by dataset discovery).
GCS functions require network + credentials and raise ImportError with a
clear message if google-cloud-storage is unavailable.
"""

import os
import shutil


def mkdir(path, delete=False):
    """Create a directory, optionally deleting an existing one first.

    Reference: utils/util.py:18-33. Unlike the reference's bare
    ``os.mkdir`` this creates intermediate directories too.
    """
    if delete:
        rmdir(path)
    os.makedirs(path, exist_ok=True)


def rmdir(path):
    """Remove a directory tree if it exists (reference utils/util.py:36-46)."""
    if os.path.exists(path):
        shutil.rmtree(path)


def _storage_client():
    try:
        from google.cloud import storage
    except ImportError as err:
        raise ImportError(
            "GCS helpers require google-cloud-storage"
        ) from err
    return storage.Client()


def list_gcs_paths(bucket_name, prefix, client=None):
    """Non-directory blob names under a prefix (reference util.py:81-102)."""
    client = client or _storage_client()
    return [
        blob.name
        for blob in client.list_blobs(bucket_name, prefix=prefix)
        if not blob.name.endswith("/")
    ]


def list_gcs_subprefixes(bucket_name, prefix, client=None):
    """Direct subdirectories of a prefix (reference util.py:105-136).

    The prefix is normalized to end with '/' so the depth filter counts
    children rather than returning the prefix directory itself.
    """
    client = client or _storage_client()
    if prefix and not prefix.endswith("/"):
        prefix = prefix + "/"
    blobs = client.list_blobs(bucket_name, prefix=prefix, delimiter="/")
    list(blobs)  # iterate to populate .prefixes
    depth = len(prefix.split("/"))
    return [
        p
        for p in blobs.prefixes
        if p.endswith("/") and len(p.split("/")) - 1 == depth
    ]


def find_subprefix_with_keyword(bucket_name, prefix, keyword, client=None):
    """First subprefix (then blob) under ``prefix`` containing ``keyword``.

    Reference: utils/util.py:50-78.
    """
    client = client or _storage_client()
    for sub in list_gcs_subprefixes(bucket_name, prefix, client=client):
        if keyword in sub:
            return sub
    for path in list_gcs_paths(bucket_name, prefix, client=client):
        if keyword in path:
            return path
    raise LookupError(
        f"prefix with keyword {keyword!r} not found in {prefix}"
    )
