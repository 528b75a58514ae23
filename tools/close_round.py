#!/usr/bin/env python3
"""Round close-out hygiene gate (VERDICT r14 finding 3 — the 4th
consecutive round shipped with its best evidence dirty or untracked:
BENCH_r14.json modified-uncommitted with a NEWER capture, the
correctness artifact untracked). This makes the habit a CHECK: it
refuses to certify the round while any round artifact is
modified-uncommitted or untracked. Run it as the LAST step of the
close checklist; it exits 1 with the offending paths until they are
committed.

Usage: close_round.py
"""
import re
import subprocess
import sys

PATTERNS = [
    r"^BENCH_r\d+\.json$",
    r"^CORRECTNESS_r\d+\.json$",
    r"^CORRECTNESS_sf01_r\d+\.json$",
    r"^PROBE_r\d+\.json$",
    r"^LEAKCHECK\.json$",
    r"^bench\.json$",
    r"^SURVEY\.md$",
]

out = subprocess.run(["git", "status", "--porcelain"],
                     capture_output=True, text=True, check=True).stdout
bad = []
for line in out.splitlines():
    status, path = line[:2], line[3:].strip()
    if any(re.match(p, path) for p in PATTERNS):
        bad.append(f"  {status} {path}")

if bad:
    print("ROUND NOT CLOSABLE — round artifacts dirty or untracked:")
    print("\n".join(bad))
    print("commit them (the round's history must hold its own evidence)")
    sys.exit(1)
print("round artifacts clean — closable")
