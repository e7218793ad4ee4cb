# Sphinx configuration for lagrangiancoherence_tpu
# (counterpart of the reference's docs/source/conf.py sphinx setup, with
# working autodoc targets — the reference's docs referenced removed names,
# SURVEY.md Q7).
import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "lagrangiancoherence-tpu"
author = "lagrangiancoherence-tpu developers"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.doctest",
    "sphinx.ext.viewcode",
]

autodoc_mock_imports = ["jax", "jaxlib", "h5py", "scipy"]
html_theme = "alabaster"
