"""The driver-contract rotation in __spark_entry__ decides which queries
land inside the driver's bounded correctness prefix each round — a silent
bug here wastes a whole round of attestation, so the policy is pinned:

  1. hash-matched names are settled and go last;
  2. err == "no_oracle" rows are ALSO settled (a rows-only check can never
     improve, re-submitting burns a prefix slot);
  3. real failures and never-checked names come first (family round-robin);
  4. oracle-less pending names queue after oracle-backed ones;
  5. LATE_ADDITIONS queue after older pending names.
"""

import json

import __spark_entry__ as E
from apache_flink_essentials_spark import registry


def _fake_correctness(tmp_path, monkeypatch, rows):
    p = tmp_path / "CORRECTNESS_r88.json"
    p.write_text(json.dumps(rows))
    monkeypatch.setattr(
        E.glob, "glob", lambda pattern: [str(p)] if "CORRECTNESS" in pattern else []
    )


def test_verified_names_policy(tmp_path, monkeypatch):
    _fake_correctness(tmp_path, monkeypatch, {
        "green":     {"rows_match": True, "schema_match": True,
                      "hash_match": True, "err": None},
        "rows_only": {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "no_oracle"},
        "hash_fail": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "errored":   {"rows_match": None, "schema_match": None,
                      "hash_match": None, "err": "boom"},
    })
    v = E._verified_names()
    assert "green" in v and "rows_only" in v          # settled
    assert "hash_fail" not in v and "errored" not in v  # must re-run


def test_driver_order_partitions(tmp_path, monkeypatch):
    names = list(registry.QUERIES)
    some_oracle = [n for n in names if n in registry.ORACLES
                   and n not in registry.LATE_ADDITIONS][:4]
    _fake_correctness(tmp_path, monkeypatch, {
        some_oracle[0]: {"rows_match": True, "schema_match": True,
                         "hash_match": True, "err": None},
    })
    order = E._driver_order(names)
    assert sorted(order) == sorted(names)             # a permutation
    # the settled name goes to the very back, after every pending name
    # (oracle-backed, late, and rows-only alike)
    assert order.index(some_oracle[0]) == len(order) - 1
    assert order.index(some_oracle[1]) < order.index(some_oracle[0])
    # late additions come after every older pending oracle-backed name
    pending_old = [n for n in names
                   if n in registry.ORACLES
                   and n not in registry.LATE_ADDITIONS
                   and n != some_oracle[0]]
    for late in registry.LATE_ADDITIONS:
        assert order.index(late) > max(order.index(n) for n in pending_old)
    # oracle-less pending names come after oracle-backed pending ones
    rows_only = [n for n in names if n not in registry.ORACLES]
    for n in rows_only:
        assert order.index(n) > max(order.index(p) for p in pending_old)


def test_settled_tail_orders_stalest_attestation_first(tmp_path, monkeypatch):
    """Round-11 rotation: within the settled tail, a name whose latest
    green row is OLDER sorts earlier, so the driver's bounded prefix
    re-attests stale rows each round."""
    names = list(registry.QUERIES)
    picks = [n for n in names if n in registry.ORACLES][:3]
    old_p = tmp_path / "CORRECTNESS_r03.json"
    new_p = tmp_path / "CORRECTNESS_r07.json"
    green = {"rows_match": True, "schema_match": True,
             "hash_match": True, "err": None}
    # picks[0] green in r3 only (stale); picks[1] green in r3 AND r7
    # (fresh wins); picks[2] green in r7 only
    old_p.write_text(json.dumps({picks[0]: green, picks[1]: green}))
    new_p.write_text(json.dumps({picks[1]: green, picks[2]: green}))
    monkeypatch.setattr(
        E.glob, "glob",
        lambda pattern: (
            [str(old_p), str(new_p)] if "CORRECTNESS" in pattern else []
        ),
    )
    v = E._verified_names()
    assert v[picks[0]] == 3 and v[picks[1]] == 7 and v[picks[2]] == 7
    order = E._driver_order(names)
    # all three are settled (go after every pending name), and the r3
    # name precedes both r7 names within the tail
    assert order.index(picks[0]) < order.index(picks[1])
    assert order.index(picks[0]) < order.index(picks[2])
    assert order[-3:][0] == picks[0] or order.index(picks[0]) >= len(order) - 3
