"""bench.py's driver contract: ONE parseable JSON line on stdout.

The grading driver records `python bench.py` stdout verbatim as the
round's BENCH artifact — any stray print would corrupt it.  Run the
query tier at sf0.001 with a single repeat (fast) in a fresh
subprocess, exactly as the driver does.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_stdout_is_one_json_line():
    env = {
        **os.environ,
        "BENCH_SKIP_CRAWL": "1",
        "BENCH_SKIP_DEEP": "1",
        "BENCH_BEST_OF": "1",
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "8",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        check=True,
        timeout=480,
        env=env,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines[:3]}"
    d = json.loads(lines[0])
    assert d["unit"] == "sec" and d["value"] > 0
    assert len(d["queries"]) == 27
    assert set(d["queries"]) >= {
        "flagship_last3_days",
        "q69_dgt_enrichment",
        "q70_boilerplate_strip",
        "q71_deterministic_shuffle",
        "q73_chart_series_m4",
    }
