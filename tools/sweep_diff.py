"""Compare two SWEEP_*.json artifacts (VERDICT r8 #6).

Judges and future rounds have been diffing sweep artifacts by hand;
this prints the one-page report that matters: per-query value-hash
changes, row-count drifts, queries added/removed between the two
runs, and green/bad status flips. Works across the artifact shapes
driver_check has emitted (plain results map, or the wrapped
``{"results": {...}}`` form with sweep metadata).

A hash CHANGE between two sweeps of the SAME sf_dir is a correctness
regression signal (the data didn't move, so the values did); between
different sf_dirs it is expected and reported under a separate
heading. Slice sub-results (the sampled-slice VALUE mode) are
compared the same way.

Usage: python tools/sweep_diff.py OLD.json NEW.json
Exit 0 = no drift on the common set; 1 = drift found.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> tuple[dict, dict]:
    with open(path) as f:
        raw = json.load(f)
    if "results" in raw and isinstance(raw["results"], dict):
        return raw.get("sf_dir", "?"), raw["results"]
    return "?", raw


def _status(r: dict) -> str:
    """Collapse one result row to a comparable status token."""
    err = r.get("err") or ""
    sl = r.get("slice") or {}
    if r.get("hash_match") is True:
        return "hash_exact"
    if sl.get("hash_match") is True:
        return f"slice_hash_exact[{sl.get('prefixes')}]"
    if err == "no_oracle" and r.get("spark_rows") is not None:
        return "rows_only_by_design"
    if err.startswith("rows_only_gt_") and r.get("rows_match"):
        return "rows_only"
    return f"BAD({err or 'hash_mismatch'})"


def diff(old_path: str, new_path: str) -> dict:
    old_sf, old = _load(old_path)
    new_sf, new = _load(new_path)
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    same_data = old_sf == new_sf

    drifts = []
    for name in common:
        o, n = old[name], new[name]
        row = {"query": name}
        if o.get("spark_rows") != n.get("spark_rows"):
            row["rows"] = [o.get("spark_rows"), n.get("spark_rows")]
        so, sn = _status(o), _status(n)
        if so != sn:
            row["status"] = [so, sn]
        # value digests (recorded from r9 on): a digest change with
        # unchanged row count is exactly the silent value drift a
        # rows-only diff cannot see
        if (o.get("value_sha") and n.get("value_sha")
                and o["value_sha"] != n["value_sha"]):
            row["value_sha"] = [o["value_sha"][:12],
                                n["value_sha"][:12]]
        if len(row) > 1:
            drifts.append(row)
    return {
        "old": {"path": old_path, "sf_dir": old_sf, "n": len(old)},
        "new": {"path": new_path, "sf_dir": new_sf, "n": len(new)},
        "same_sf_dir": same_data,
        "added": added,
        "removed": removed,
        "drifts": drifts,
    }


def main(argv) -> int:
    if len(argv) != 2:
        print("usage: sweep_diff.py OLD.json NEW.json")
        return 2
    d = diff(argv[0], argv[1])
    print(f"old: {d['old']['path']} ({d['old']['n']} queries, "
          f"sf={d['old']['sf_dir']})")
    print(f"new: {d['new']['path']} ({d['new']['n']} queries, "
          f"sf={d['new']['sf_dir']})")
    if d["added"]:
        print(f"\nadded ({len(d['added'])}): {', '.join(d['added'])}")
    if d["removed"]:
        print(f"\nremoved ({len(d['removed'])}): "
              f"{', '.join(d['removed'])}")
    if not d["drifts"]:
        print("\nno row-count or status drift on the common set")
    else:
        kind = ("REGRESSION SIGNAL (same sf_dir)" if d["same_sf_dir"]
                else "expected cross-SF differences")
        print(f"\ndrift on common set — {kind}:")
        for row in d["drifts"]:
            bits = []
            if "rows" in row:
                bits.append(f"rows {row['rows'][0]} -> {row['rows'][1]}")
            if "status" in row:
                bits.append(
                    f"status {row['status'][0]} -> {row['status'][1]}")
            if "value_sha" in row:
                bits.append(f"value_sha {row['value_sha'][0]} -> "
                            f"{row['value_sha'][1]}")
            print(f"  {row['query']}: {'; '.join(bits)}")
    return 1 if d["drifts"] else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
