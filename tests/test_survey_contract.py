"""SURVEY.md §2 is the declared-obligation contract (r7 verdict: keys
the driver can discover but the contract doesn't list silently escape
judge coverage checks). This pins registry == declaration: every
registered q_* key must appear in SURVEY.md, so a new operator cannot
land without its contract row."""

from __future__ import annotations

import os
import re

from flink_rc_spark.registry import REGISTRY, load_all

load_all()


def test_every_registered_key_is_declared_in_survey():
    # Only an actual §2 contract-table ROW counts as a declaration
    # (r8 advice: a key mentioned in passing prose elsewhere in
    # SURVEY.md must not satisfy the pin). Table rows lead with
    # "| q_key " or "| `q_key` ".
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "SURVEY.md")) as f:
        declared = set(
            re.findall(r"^\| +`?(q_[a-z0-9_]+)`?\b", f.read(), re.MULTILINE)
        )
    undeclared = sorted(set(REGISTRY) - declared)
    assert not undeclared, (
        "registered keys missing a SURVEY.md row (add the §2 table "
        f"entry): {undeclared}"
    )
