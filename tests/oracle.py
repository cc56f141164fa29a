"""Access to the reference implementation as a correctness oracle.

The reference package (``cve-mohd/flow-sim``) is mounted read-only at
/root/reference.  Tests import it (never copy it) to generate ground-truth
values for allclose comparisons, per the test strategy in SURVEY.md §4.
"""

from __future__ import annotations

import os
import sys

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src", "hydromodel"))


def import_reference():
    """Import the reference `src.hydromodel` package from /root/reference."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.hydromodel as hm  # noqa: F401

    from src.hydromodel import (  # noqa: F401
        boundary,
        channel,
        cross_section,
        hydraulics,
        hydrograph,
        lumped_storage,
        preissmann,
        rating_curve,
        solver,
        utility,
    )

    return sys.modules["src.hydromodel"]
