"""Run the on-chip kernel tier and record a driver-visible artifact
(VERDICT r2 item 7): ONCHIP_r{N}.json next to BENCH_r{N}.json.

Usage: python scripts/record_onchip.py <round>   (e.g. 3)
"""
import json
import os
import re
import subprocess
import sys
import time

rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
t0 = time.time()
proc = subprocess.run(
    [sys.executable, "-m", "pytest", "tests/test_tpu_onchip.py",
     "-q", "-s", "--tb=line", "-p", "no:cacheprovider"],
    env=dict(os.environ, XFMAMBA_TEST_TPU="1"),
    cwd="/root/repo", capture_output=True, text=True, timeout=3600)
out = proc.stdout + proc.stderr
m = re.search(r"(\d+) passed", out)
passed = int(m.group(1)) if m else 0
m = re.search(r"(\d+) failed", out)
failed = int(m.group(1)) if m else 0
# per-geometry measured max-rel-err table (the numbers behind the
# tolerances in tests/test_tpu_onchip.py)
errors = {name: float(val) for name, val in
          re.findall(r"ONCHIP_ERR (\S+) (\S+)", out)}
record = {
    "round": rnd,
    "suite": "tests/test_tpu_onchip.py",
    "passed": passed,
    "failed": failed,
    "ok": failed == 0 and passed > 0,
    "seconds": round(time.time() - t0, 1),
    "max_rel_err": errors,
    "tail": out.strip().splitlines()[-1] if out.strip() else "",
}
path = f"/root/repo/ONCHIP_r{rnd:02d}.json" if rnd else \
    "/root/repo/ONCHIP.json"
with open(path, "w") as f:
    json.dump(record, f, indent=1)
print(json.dumps(record))
sys.exit(0 if record["ok"] else 1)
