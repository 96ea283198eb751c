"""Minimal MONAI test-shim — see tests/refshim/README.md."""
from . import networks, utils  # noqa: F401
