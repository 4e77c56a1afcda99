"""Scaling-efficiency evidence (north rule): the same pipeline job on the
same input at two parallelism levels (local[8] ≙ N executors, local[32] ≙
4N), reporting throughput at both plus efficiency = T_8 / (4 · T_32).

Each level runs in its own subprocess (fresh JVM) against one shared
pages parquet, so only the executor-thread count differs.

Usage: python tools/scaling.py [n_pages] [n_entities] [content_scale]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    n_entities = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    content_scale = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    workdir = tempfile.mkdtemp(prefix="chf_scaling_")
    pages_path = os.path.join(workdir, "pages.parquet")
    here = os.path.dirname(os.path.abspath(__file__))
    subprocess.run(
        [sys.executable, os.path.join(here, "gen_pages.py"),
         str(n_pages), str(n_entities), str(content_scale), pages_path],
        check=True,
    )
    print(f"# generated {n_pages} pages -> {pages_path}", file=sys.stderr)

    results = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for cpus in (8, 32):
        out_json = os.path.join(workdir, f"scale_{cpus}.json")
        subprocess.run(
            [sys.executable, os.path.join(here, "scaling_run.py"),
             str(cpus), pages_path, str(n_entities), out_json],
            check=True,
        )
        with open(out_json) as f:
            results[cpus] = json.load(f)
        print(f"# local[{cpus}]: {results[cpus]}", file=sys.stderr)

    eff = results[8]["wall_sec"] / (4 * results[32]["wall_sec"])
    print(json.dumps({
        "n_pages": n_pages,
        "local8": results[8],
        "local32": results[32],
        "speedup_8_to_32": round(results[8]["wall_sec"] / results[32]["wall_sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
