"""Minimal timm test-shim — see tests/refshim/README.md."""
from . import models  # noqa: F401
