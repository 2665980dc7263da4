"""Reference-shaped fixtures per FIXTURES.md (tree JSON F4, archive F3
edge cases: misaligned source timestamps, NULLs, boundary rows)."""

from __future__ import annotations

import json
from datetime import datetime, timedelta

TREE = [
    {
        "name": "Plant1", "webid": "W0", "is_leaf": False,
        "attributes": [],
        "children": [
            {
                "name": "Boiler", "webid": "W1", "is_leaf": False,
                "attributes": [],
                "children": [
                    {"name": "FanA", "webid": "W2", "children": [],
                     "is_leaf": True,
                     "attributes": [
                         {"name": "Temperature", "webid": "W2A1",
                          "type": "Float64",
                          "path": "\\\\SRV\\Plant1\\Boiler\\FanA|Temperature",
                          "kks": "10HLA10CT001"},
                         {"name": "Pressure", "webid": "W2A2",
                          "type": "Float64",
                          "path": "\\\\SRV\\Plant1\\Boiler\\FanA|Pressure",
                          "kks": None},
                     ]},
                    {"name": "Fan B", "webid": "W3", "children": [],
                     "is_leaf": True,
                     "attributes": [
                         {"name": "Temperature", "webid": "W3A1",
                          "type": "Float64",
                          "path": "\\\\SRV\\Plant1\\Boiler\\Fan B|Temperature",
                          "kks": "10HLA20CT001"},
                     ]},
                ],
            },
            {"name": "Tuabin Hơi", "webid": "W4", "children": [],
             "is_leaf": True, "attributes": []},
        ],
    },
    # root with no children: tests root-as-leaf edge (FIXTURES.md F1)
    {"name": "Plant2", "webid": "W9", "is_leaf": True, "children": [],
     "attributes": []},
]

T0 = datetime(2025, 1, 1, 0, 0, 0)


def write_tree(tmp_path) -> str:
    p = str(tmp_path / "tree_cache.json")
    with open(p, "w", encoding="utf-8") as f:
        json.dump(TREE, f, ensure_ascii=False)
    return p


def archive_rows(attr_a: int = 2, attr_b: int = 3, minutes: int = 60):
    """1-min grid for two source attributes; attr_b missing on odd
    minutes (misaligned, exercises the all-sources-present guard);
    a NULL value at minute 10."""
    rows = []
    for m in range(minutes):
        ts = T0 + timedelta(minutes=m)
        rows.append((attr_a, ts, None if m == 10 else 100.0 + m))
        if m % 2 == 0:
            rows.append((attr_b, ts, 200.0 + m))
    return rows
