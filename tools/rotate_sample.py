#!/usr/bin/env python3
"""Rotating sf0.1 sample picker (VERDICT r14 task 5): the sf0.1
spot-gate covered only the bench headline, so scale-dependent wrongness
in the other ~250 queries could hide indefinitely. This picks a
DETERMINISTIC rotating ~1/K slice of the whole board: a query is in
round R's sample iff (md5(name) + R) % K == 0 — every query gets sf0.1
exposure exactly once every K rounds (K=3 by default, ~100 rows per
round), and the (round, K) pair recorded in the gate artifact makes the
sample reproducible.

Usage: rotate_sample.py <oracle_sql.json> <round> [K]
Prints the comma-separated name list (Verify's 3rd-arg filter) on
stdout; the census goes to stderr. Typical round flow:

  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/v001"   # all
  NAMES=$(python3 tools/rotate_sample.py /tmp/v001/oracle_sql.json 15)
  sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/v01 $NAMES"
  GRAFT_SF01_META="round=15 k=3" python3 tools/sf01_gate.py \\
      /tmp/v01 /root/testdata/sf0.1 CORRECTNESS_sf01_r15.json
"""
import hashlib
import json
import sys

oracle = json.load(open(sys.argv[1]))
rnd = int(sys.argv[2])
k = int(sys.argv[3]) if len(sys.argv) > 3 else 3
names = sorted(
    n for n in oracle
    if (int(hashlib.md5(n.encode()).hexdigest(), 16) + rnd) % k == 0)
print(",".join(names))
print(f"rotating sample: round={rnd} k={k} -> {len(names)} of "
      f"{len(oracle)} queries", file=sys.stderr)
