"""Auditable record of the ONE flagged substitution: h3lite is
layout-compatible, NOT spec-exact H3 (SURVEY.md §8, VERDICT r2 item 2).

The embedded vectors below are the spec-H3 cell ids recallable from
public H3 documentation (all SF-bay points — the examples the H3
README/bindings docs use). They are the acceptance tests a future
spec-exact encoder must pass; today they are asserted to NOT match
h3lite, which is the honest, machine-checked statement of the gap.

Why spec-exact H3 is not shipped (the concrete blockers, recorded per
VERDICT r2 item 2's escape clause — see SURVEY.md §8 for the full
audit):

- The algorithmic pipeline (gnomonic face projection -> Class II/III
  hex2d -> cube-rounded IJK -> aperture-7 digit unwinding -> index bit
  packing) is publishable prose, but the output is fixed by three large
  hand-authored constant tables in the reference implementation:
  ``baseCellData[122]`` (home face + IJK + pentagon flags + cw offsets),
  ``faceIjkBaseCells[20][3][3][3]`` (540 {baseCell, ccwRot60} entries),
  and the 20-face center/axis tables.
- This sandbox has no h3 library and no network, so those tables cannot
  be obtained or validated; reconstructing 600+ integers from memory
  would be unverifiable against only the ~3 public vectors below (all
  on ONE face / one base-cell neighborhood). A table that passes these
  3 vectors can still be wrong on the other 119 base cells — and
  claiming spec-exactness on fabricated constants is strictly worse
  than the flagged substitute.
"""

from __future__ import annotations

import numpy as np

from hand_index_spark.geo import cells

# (lat, lng, res, spec-H3 cell id) — provenance in comments.
SPEC_H3_VECTORS = [
    # H3 C library README quickstart example
    (37.3615593, -122.0553238, 5, 0x85283473FFFFFFF),
    # h3-js README example (same point, res 7)
    (37.3615593, -122.0553238, 7, 0x87283472BFFFFFF),
    # h3-py docs example (SF, res 9)
    (37.7752702151959257, -122.418307270836565, 9, 0x8928308280FFFFF),
]


def test_h3lite_diverges_from_spec_h3_and_is_flagged():
    """h3lite must NOT be mistaken for spec H3: every embedded public
    vector differs, and the module docstring carries the flag."""
    for lat, lng, res, spec_id in SPEC_H3_VECTORS:
        got = int(cells.encode(np.array([lat]), np.array([lng]), res)[0])
        assert got != spec_id, (
            "h3lite unexpectedly matched a spec-H3 vector — if a "
            "spec-exact encoder landed, flip this test into an equality "
            "suite and clear the SURVEY §8 flag"
        )
        # the layout fields are still well-formed (mode bit + res)
        assert got > 0 and (got >> 52) & 0xF == res
    doc = cells.__doc__ or ""
    assert "not-spec-exact" in doc.replace("\n", " ") or "layout-compatible" in doc


def test_h3lite_spec_gap_is_documented_in_survey():
    with open("/root/repo/SURVEY.md") as f:
        s = f.read()
    assert "baseCellData" in s and "faceIjkBaseCells" in s, (
        "SURVEY §8 must name the exact blocking constant tables"
    )
