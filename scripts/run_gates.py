"""Run the TPU statistical/golden gates and record GATES_r<N>.json.

The pallas samplers' stochastic behavior cannot be exercised by the CPU
test suite (the interpreter PRNG is a no-op), so these gates run on real
TPU hardware and their results are checked into the repo as one
machine-readable JSON file per round — kernel changes must re-run this
before committing (CLAUDE.md workflow).

Usage: python scripts/run_gates.py [round_number]
"""

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(script, timeout=900):
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, script)],
        capture_output=True, text=True, timeout=timeout, cwd=REPO,
        env={**os.environ, "PYTHONPATH": f"{REPO}:/root/.axon_site"},
    )
    out = proc.stdout
    return {
        "script": script,
        "passed": proc.returncode == 0 and "GATE PASSED" in out,
        "seconds": round(time.perf_counter() - t0, 1),
        "stdout_tail": out.strip().splitlines()[-8:],
    }


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results = {"gates": [], "backend": None}
    for script in (
        "gate_pallas_denovo.py",
        "gate_pallas_calling.py",
        "gate_pallas_pedigree.py",
        "gate_assemble_tpu.py",
    ):
        res = run(script)
        # extract TV numbers when present
        for line in res["stdout_tail"]:
            m = re.match(r"TV\((\w+), (\w+)\)\s*= ([0-9.]+)", line)
            if m:
                res[f"tv_{m.group(1)}_{m.group(2)}"] = float(m.group(3))
            if line.startswith("backend:"):
                results["backend"] = line.split(":", 1)[1].strip()
        results["gates"].append(res)
    results["all_passed"] = all(g["passed"] for g in results["gates"])
    path = os.path.join(REPO, f"GATES_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))
    print(f"wrote {path}")
    sys.exit(0 if results["all_passed"] else 1)


if __name__ == "__main__":
    main()
