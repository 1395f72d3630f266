"""sf1-scale stress of the superlinear-risk pipelines WITH caps engaged
(VERDICT r03 #5).

Builds a deterministic ~50k-doc corpus (10x the sf0.1 documents table,
tiled with offset doc_ids and UNCHANGED text — every doc therefore has 10
exact copies, which multiplies every gram's document frequency by 10: the
boilerplate blowup the `max_df` cap exists for), then runs:

  1. `jaccard_pair_pipeline` with `max_df` engaged — the inverted-index
     pair space is O(sum df^2 per gram); uncapped, the 10x corpus pays
     100x pair volume, capped it stays linear in surviving grams.
  2. `cooccurrence_topk` with `max_doc_tokens` engaged.
  3. Jaccard pairs -> `connected_components` (cluster assignment).
  4. `minhash_dedup_pipeline` (banded LSH + distributed exact verify).

Prints ONE JSON line with wall seconds + output sizes; record in
BASELINE.md.  Cap semantics are pinned by
tests/test_text_dedup.py::test_jaccard_max_df_cap_contract and
::test_cooccurrence_max_doc_tokens_cap_contract (caps change answers by
design; the capped contract is the documented one).

Usage (from /root/repo, nothing else running):
    python tools/stress_sf1.py [sf_dir=/root/testdata/sf0.1] [copies=10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_corpus(sf_dir: str, copies: int, out_dir: str) -> int:
    src = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    os.makedirs(out_dir, exist_ok=True)
    n = src.num_rows
    parts = []
    for c in range(copies):
        part = pa.table(
            {
                "doc_id": pc.add(src["doc_id"], c * n),
                "text": src["text"],
                "lang": src["lang"],
                "source": src["source"],
            }
        )
        pq.write_table(
            part.select(["doc_id", "text"]),
            os.path.join(out_dir, f"copy-{c:02d}.parquet"),
        )
        parts.append(part)
    # a registered-query-shaped sf dir (single documents.parquet, row-group
    # split for read parallelism) so q_* entries run at this scale directly
    sf_like = out_dir + "_sf"
    os.makedirs(sf_like, exist_ok=True)
    pq.write_table(
        pa.concat_tables(parts),
        os.path.join(sf_like, "documents.parquet"),
        row_group_size=4096,
    )
    return n * copies


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd

    from feast_ray.stages.cc import connected_components
    from feast_ray.stages.dedup import jaccard_pair_pipeline, minhash_dedup_pipeline
    from feast_ray.stages.text import cooccurrence_topk

    corpus_dir = f"/tmp/feast_ray_stress/docs_x{copies}"
    marker = corpus_dir + ".done"
    if not (
        os.path.exists(marker)
        and os.path.exists(os.path.join(corpus_dir + "_sf", "documents.parquet"))
    ):
        n_docs = build_corpus(sf_dir, copies, corpus_dir)
        with open(marker, "w") as f:
            f.write(str(n_docs))
    n_docs = int(open(marker).read())

    report: dict = {"metric": "sf1_stress", "n_docs": n_docs, "copies": copies}

    def docs():
        return rd.read_parquet(corpus_dir, columns=["doc_id", "text"])

    t0 = time.perf_counter()
    pairs = jaccard_pair_pipeline(docs(), tau=0.2, max_df=50).materialize()
    report["jaccard_max_df50_s"] = round(time.perf_counter() - t0, 2)
    report["jaccard_pairs"] = pairs.count()

    t0 = time.perf_counter()
    cooc = cooccurrence_topk(docs(), k=50, max_doc_tokens=200)
    report["cooccur_cap200_rows"] = (
        cooc.count() if hasattr(cooc, "count") else len(cooc)
    )
    report["cooccur_cap200_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    labels = connected_components(
        pairs.select_columns(["doc_a", "doc_b"]),
        src="doc_a", dst="doc_b", node_col="doc_id", comp_col="comp",
    ).materialize()
    report["cluster_s"] = round(time.perf_counter() - t0, 2)
    report["clustered_docs"] = labels.count()

    t0 = time.perf_counter()
    kept = minhash_dedup_pipeline(docs(), tau=0.5).materialize()
    report["minhash_s"] = round(time.perf_counter() - t0, 2)
    report["minhash_kept"] = kept.count()

    # round-4 additions at 10x: pair space of the source-overlap matrix is
    # O(sum m^2 per gram) with m = SOURCES per gram — tiling multiplies df
    # but not m, so it must stay near-linear; lm/dsir are two linear scans
    # plus a vocab/bucket-bounded exchange.
    from feast_ray.pipelines.queries import QUERIES

    sf_like = corpus_dir + "_sf"
    for qname, key in [
        ("cross_source_overlap", "xsrc"),
        ("lm_surprisal_docs", "lm"),
        ("dsir_select_docs", "dsir"),
    ]:
        t0 = time.perf_counter()
        out = QUERIES[qname](sf_like)
        n_rows = out.num_rows if isinstance(out, pa.Table) else out.count()
        report[f"{key}_s"] = round(time.perf_counter() - t0, 2)
        report[f"{key}_rows"] = int(n_rows)

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
