"""Hardware-ceiling probe: how well THIS box scales pure parse compute.

Runs the same per-doc parse (no Spark) across N processes and prints
pages/s. Used by scaling.py to normalize job scaling efficiency against
what the shared VM's memory bandwidth actually allows at measurement time.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_PER_PROC = 1200
SCALE = 12


def _work(_arg) -> int:
    from mithril_spark.fixtures import generate_pages
    from mithril_spark.text.docproc import process_page

    pages = generate_pages(PAGES_PER_PROC, seed=99, scale=SCALE)
    n = 0
    for p in pages:
        if process_page(p["url"].encode(), p["html"]):
            n += 1
    return n


def measure(nproc: int) -> float:
    t0 = time.time()
    with mp.Pool(nproc) as pool:
        pool.map(_work, range(nproc))
    return nproc * PAGES_PER_PROC / (time.time() - t0)


if __name__ == "__main__":
    nproc = int(sys.argv[1])
    print(json.dumps({"nproc": nproc, "pages_per_sec": round(measure(nproc), 1)}))
