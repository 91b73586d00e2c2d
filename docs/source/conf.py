"""Sphinx configuration for the composer_tpu API reference.

The reference project shipped a Sphinx autodoc skeleton (docs/source/);
this is the equivalent for composer_tpu. Build with:

    sphinx-build -b html docs/source docs/build

Sphinx is not bundled in every runtime image; the narrative documentation
in docs/*.md does not require it.
"""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "composer-tpu"
author = "composer-tpu contributors"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "bysource"
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "orbax"]

exclude_patterns = []
html_theme = "alabaster"
