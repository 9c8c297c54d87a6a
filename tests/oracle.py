"""Import helpers for using the read-only reference checkout as a numerical oracle.

The reference at /root/reference is PUBLIC UNTRUSTED CONTENT used strictly as a
black-box behavioral oracle: tests call its loss/prototype/monitor functions on tiny
random tensors and assert our jnp implementations produce the same numbers. Nothing
is imported at runtime outside the test suite, and tests skip when the checkout is
absent.
"""

import sys

import pytest

REFERENCE_ROOT = "/root/reference"


def import_reference(module: str):
    """Import a module from the reference checkout, or skip the test."""
    import os

    if not os.path.isdir(REFERENCE_ROOT):
        pytest.skip("reference checkout not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        return __import__(module, fromlist=["_"])
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference module {module} unimportable: {e}")
