"""10x-scale CORRECTNESS gate over the core query set (round-4 verdict ask #6).

``stress_sf1.py`` / ``stress_events_10x.py`` measure *wall time* at 10x;
this tool re-runs the Ray-vs-DuckDB oracle comparison itself at 10x data:

1. Builds a fixture dir where ``events`` and ``documents`` are the sf0.1
   tables tiled ``copies``x with OFFSET ``event_id``/``doc_id`` but
   unchanged user ids, timestamps and text — per-user history gets 10x
   denser (stresses grouped kernels, per-group sorts, window machinery)
   and every document gains 10 exact copies (stresses dedup/cluster
   paths at high duplicate density).  Id offsets keep every
   deterministic id-based tie rule meaningful, so Ray and DuckDB must
   still agree bit-for-bit.  All other tables are copied through.
2. Runs ``tools/check_correctness.py`` over the SURVEY-core query list
   (``CORE_QUERIES``) against that fixture, chunked into fresh Ray
   sessions exactly like the driver-scale gate.

Usage (from /root/repo, nothing else running — takes ~15 min):
    python tools/gate_10x.py [sf_dir=/root/testdata/sf0.1] [copies=10] \
        [chunk=10] [n_core=all-of-CORE_QUERIES]

Exit code 0 iff every chunk passed; prints the same [ OK ]/[FAIL] lines
as the driver-scale gate.  Record the summary in BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _tile(src: pa.Table, id_col: str, copies: int) -> pa.Table:
    """copies x src with id_col offset per copy (ids stay unique)."""
    base = pc.max(src[id_col]).as_py() + 1
    parts = []
    for c in range(copies):
        ids = pc.add(src[id_col], pa.scalar(c * base, src.schema.field(id_col).type))
        parts.append(src.set_column(src.schema.get_field_index(id_col), id_col, ids))
    return pa.concat_tables(parts)


def build_fixture(sf_dir: str, copies: int, out_dir: str) -> None:
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    for t in TABLES:
        src_path = f"{sf_dir}/{t}.parquet"
        dst_path = f"{out_dir}/{t}.parquet"
        if t in ("events", "documents"):
            src = pq.read_table(src_path)
            id_col = "event_id" if t == "events" else "doc_id"
            tiled = _tile(src, id_col, copies)
            pq.write_table(tiled, dst_path)
            print(f"[fixture] {t}: {src.num_rows} -> {tiled.num_rows} rows")
        else:
            shutil.copyfile(src_path, dst_path)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    out_dir = "/tmp/feast_ray_gate10x"

    from feast_ray.pipelines.queries import CORE_QUERIES, QUERIES

    names = [k for k in CORE_QUERIES if k in QUERIES]
    if len(sys.argv) > 4:
        names = names[: int(sys.argv[4])]

    build_fixture(sf_dir, copies, out_dir)

    checker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "check_correctness.py")
    t0 = time.perf_counter()
    rc = 0
    for i in range(0, len(names), chunk):
        batch = ",".join(names[i : i + chunk])
        for attempt in (1, 2):
            p = subprocess.run([sys.executable, checker, out_dir, batch], cwd="/root/repo")
            if p.returncode == 0:
                break
            print(f"[chunk {i // chunk}] attempt {attempt} rc={p.returncode}")
        else:
            rc = 1
    print(f"[gate_10x] {len(names)} core queries at {copies}x "
          f"in {time.perf_counter() - t0:.0f}s rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
