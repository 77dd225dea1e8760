"""Regenerate the COVERAGE.md driver-query index from the live registry:
every `queries()` entry with its gate (oracle = has `oracle_sql()` SQL;
golden = pinned in tests/test_golden_values.py; rows = neither — should be
empty). Run after adding operators:

    python tools/gen_query_index.py          # rewrite COVERAGE.md in place
    python tools/gen_query_index.py --check  # exit 1 if COVERAGE.md is stale
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gates() -> dict[str, str]:
    import __ray_entry__ as entry

    qs = entry.queries()
    osql = entry.oracle_sql()
    # golden pins are the literal keys of the GOLDEN dict in the test module
    src = open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tests", "test_golden_values.py")
    ).read()
    m = re.search(r"GOLDEN = \{(.*?)\n\}", src, re.S)
    golden = set(re.findall(r'"([a-z0-9_]+)":', m.group(1)))
    out = {}
    for name in sorted(qs):
        if name in osql:
            out[name] = "oracle"
        elif name in golden:
            out[name] = "golden"
        else:
            out[name] = "rows"
    return out


def render(g: dict[str, str]) -> tuple[str, list[str]]:
    n_or = sum(1 for v in g.values() if v == "oracle")
    n_go = sum(1 for v in g.values() if v == "golden")
    n_ro = sum(1 for v in g.values() if v == "rows")
    header = (
        f"All {len(g)} `queries()` entries and their gate (oracle = DuckDB SQL "
        "hash-compare at sf0.01; golden = md5 pin at sf0.001; rows = row-count "
        "check plus the parity/pytest gate named in the tables above): "
        f"{n_or} oracle, {n_go} golden, {n_ro} rows-only."
    )
    return header, [f"- `{k}` ({v})" for k, v in sorted(g.items())]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "COVERAGE.md")
    lines = open(path).read().splitlines()
    try:
        hdr_i = next(i for i, l in enumerate(lines) if l.startswith("All ") and "`queries()` entries" in l)
    except StopIteration:
        print("COVERAGE.md: appendix header not found", file=sys.stderr)
        return 2
    idxs = [i for i, l in enumerate(lines) if l.startswith("- `")]
    start, end = idxs[0], idxs[-1]
    header, entries = render(gates())
    new = lines[:hdr_i] + [header] + lines[hdr_i + 1 : start] + entries + lines[end + 1 :]
    new_text = "\n".join(new) + "\n"
    old_text = "\n".join(lines) + "\n"
    if "--check" in sys.argv:
        if new_text != old_text:
            print("COVERAGE.md query index is STALE — run tools/gen_query_index.py")
            return 1
        print("COVERAGE.md query index is current")
        return 0
    open(path, "w").write(new_text)
    print(f"wrote {len(entries)} entries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
