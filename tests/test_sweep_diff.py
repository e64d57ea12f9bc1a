"""tools/sweep_diff.py: the artifact comparator rounds and judges
use instead of hand-diffing SWEEP_*.json files (VERDICT r8 #6)."""

import json
import subprocess
import sys

from tools.sweep_diff import _status, diff

OLD = {
    "sf_dir": "/root/testdata/sf0.01",
    "results": {
        "q1": {"spark_rows": 6, "oracle_rows": 6, "rows_match": True,
               "schema_match": True, "hash_match": True, "err": None,
               "value_sha": "a" * 64},
        "big": {"spark_rows": 7400000, "oracle_rows": 7400000,
                "rows_match": True, "schema_match": True,
                "hash_match": None, "err": "rows_only_gt_2000000"},
        "gone": {"spark_rows": 1, "oracle_rows": 1, "rows_match": True,
                 "schema_match": True, "hash_match": True, "err": None},
    },
}
NEW = {
    "sf_dir": "/root/testdata/sf0.01",
    "results": {
        "q1": {"spark_rows": 6, "oracle_rows": 6, "rows_match": True,
               "schema_match": True, "hash_match": True, "err": None,
               "value_sha": "b" * 64},  # silent value drift
        "big": {"spark_rows": 7400000, "oracle_rows": 7400000,
                "rows_match": True, "schema_match": True,
                "hash_match": None, "err": "rows_only_gt_2000000",
                "slice": {"prefixes": "0123", "hash_match": True}},
        "fresh": {"spark_rows": 3, "oracle_rows": 3, "rows_match": True,
                  "schema_match": True, "hash_match": True, "err": None},
    },
}


def _write(tmp_path, name, payload):
    p = tmp_path / name
    p.write_text(json.dumps(payload))
    return str(p)


def test_status_tokens():
    r = OLD["results"]
    assert _status(r["q1"]) == "hash_exact"
    assert _status(r["big"]) == "rows_only"
    assert (_status(NEW["results"]["big"])
            == "slice_hash_exact[0123]")
    assert _status({"err": "no_oracle", "spark_rows": 5}) \
        == "rows_only_by_design"
    assert _status({"err": "KeyError: x"}).startswith("BAD(")


def test_diff_finds_added_removed_and_drift(tmp_path):
    d = diff(_write(tmp_path, "old.json", OLD),
             _write(tmp_path, "new.json", NEW))
    assert d["added"] == ["fresh"]
    assert d["removed"] == ["gone"]
    assert d["same_sf_dir"] is True
    by_q = {r["query"]: r for r in d["drifts"]}
    # q1: same rows, same green status — but the value digest moved
    assert by_q["q1"]["value_sha"] == ["a" * 12, "b" * 12]
    # big: rows-only upgraded to slice-hash-exact (status flip)
    assert by_q["big"]["status"] == [
        "rows_only", "slice_hash_exact[0123]"]


def test_cli_exit_codes(tmp_path):
    old = _write(tmp_path, "old.json", OLD)
    new = _write(tmp_path, "new.json", NEW)
    same = subprocess.run(
        [sys.executable, "tools/sweep_diff.py", old, old],
        capture_output=True, text=True, cwd="/root/repo")
    assert same.returncode == 0
    assert "no row-count or status drift" in same.stdout
    changed = subprocess.run(
        [sys.executable, "tools/sweep_diff.py", old, new],
        capture_output=True, text=True, cwd="/root/repo")
    assert changed.returncode == 1
    assert "REGRESSION SIGNAL" in changed.stdout
