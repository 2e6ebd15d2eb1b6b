"""Short import alias: ``import pmt_tpu`` == the full-length package.

The canonical package name mirrors the reference repo
(pmt_learning_for_semantic_segmentation_and_disparity_tpu); this alias makes
interactive use bearable. Submodule imports (``import pmt_tpu.models``)
resolve through the real package's __path__.
"""
import importlib
import sys

_real = importlib.import_module(
    "pmt_learning_for_semantic_segmentation_and_disparity_tpu"
)
sys.modules[__name__] = _real
