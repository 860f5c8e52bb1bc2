"""tools/parity_real.py --dryrun: the one-command real-asset parity harness
stays green on synthetic assets (VERDICT r3 #9). The real run (released
checkpoint + Vicuna tokenizer + EPIC frames) is environment-blocked; this
keeps its plumbing exercised."""

import json
import subprocess
import sys


def test_parity_real_dryrun():
    proc = subprocess.run(
        [sys.executable, "tools/parity_real.py", "--dryrun"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()
             if x.startswith("{")]
    steps = {r["step"]: r for r in lines}
    assert steps["tokenizer"]["status"].startswith("PASS"), steps
    assert steps["logits(dryrun)"]["status"] == "PASS", steps
    assert steps["logits(dryrun)"]["max_abs_diff"] == 0.0
    # VERDICT r4 #8: the dryrun must cover BOTH eval splits end-to-end
    assert steps["eval(vanilla)(dryrun)"]["status"] == "PASS", steps
    assert steps["eval(reason)(dryrun)"]["status"] == "PASS", steps
    assert steps["eval(reason)(dryrun)"]["n"] == 2, steps
