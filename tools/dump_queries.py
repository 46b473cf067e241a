#!/usr/bin/env python
"""Regenerate QUERIES.md: flat index of every catalog query — name,
defining module, oracle status, first docstring line."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from interop_datalake_spark import catalog  # noqa: E402


def main() -> None:
    oracles = catalog.all_oracles()
    rows = []
    for mod in catalog._MODULES:
        mod_name = mod.__name__.rsplit(".", 1)[-1]
        for name, fn in mod.QUERIES.items():
            doc = " ".join((fn.__doc__ or "").strip().split())
            desc = doc.split(". ")[0].split(" — ")[0].rstrip(".")[:90]
            checked = "oracle" if name in oracles else "rows-only"
            rows.append((name, mod_name, checked, desc))
    lines = [
        "# QUERIES — the driver-checked catalog",
        "",
        f"{len(rows)} queries; {sum(1 for r in rows if r[2] == 'oracle')} with "
        "DuckDB oracle twins (hash-compared on row count + columns + values "
        "at sf0.01), the rest rows-only by design (sketches / seeded RNG).",
        "",
        "| query | module | check | description |",
        "|---|---|---|---|",
    ]
    for name, mod_name, checked, desc in sorted(rows):
        lines.append(f"| `{name}` | {mod_name} | {checked} | {desc} |")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "QUERIES.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md with {len(rows)} queries")


if __name__ == "__main__":
    main()
