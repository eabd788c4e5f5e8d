"""Sphinx configuration."""

project = "aind-exaspim-neuron-segmentation-tpu"
author = "AIND ExaSPIM TPU rebuild"
extensions = ["sphinx.ext.autodoc", "sphinx.ext.napoleon"]
html_theme = "furo"
