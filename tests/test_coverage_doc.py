"""COVERAGE.md consistency gate (VERDICT r3 item 5: the doc carried a
K7 row saying "BUILT" and, two rows below, a stale "out of scope" row).

Rules enforced:
* no operator tag (S1..S5, P1..P7, A1..A2, M1..M9, C1..C6, K1..K8) may
  open both an implemented row and an out-of-scope/n-a row;
* every driver-query name referenced in the table exists in the
  queries() registry.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOC = open(os.path.join(REPO, "COVERAGE.md")).read()

TAG = re.compile(r"^\|\s*([SPAMCK]\d+)\b", re.M)


def _rows():
    out = []
    for line in DOC.splitlines():
        m = TAG.match(line)
        if m:
            out.append((m.group(1), line))
    return out


def test_no_tag_is_both_built_and_out_of_scope():
    status = {}
    for tag, line in _rows():
        is_na = "out of scope" in line.lower() or "n/a" in line.lower()
        status.setdefault(tag, set()).add("na" if is_na else "built")
    contradictions = {t: s for t, s in status.items() if len(s) > 1}
    assert not contradictions, contradictions


def test_driver_query_refs_exist():
    q = set(entrymod.queries())
    # third column of each op row names driver queries ("—" for none)
    missing = []
    for _tag, line in _rows():
        cells = [c.strip() for c in line.split("|")]
        if len(cells) < 5:
            continue
        ref = cells[3]
        if ref in ("—", "-", ""):
            continue
        for name in re.split(r"[,\s()]+", ref):
            name = name.strip().rstrip(",")
            # only tokens shaped like registry names (prefix_rest);
            # the column also carries prose annotations
            if (name and "_" in name
                    and re.fullmatch(r"[a-z][a-z0-9]*_[a-z0-9_]+", name)
                    and name not in q):
                missing.append((cells[1][:30], name))
    assert not missing, missing
