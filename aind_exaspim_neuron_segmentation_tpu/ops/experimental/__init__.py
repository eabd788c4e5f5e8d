"""Experimental kernels -- interpreter-validated, not on production paths."""
