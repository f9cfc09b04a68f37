"""No-engine scaling ceiling for THIS host, measured with plain
multiprocessing — no Ray anywhere.

The N->4N scaling criterion is a cluster criterion run, in this sandbox, on
ONE box: 4x the workers share one memory subsystem instead of getting 4x of
everything. This script bounds what ANY engine could achieve here by running
the exact fused per-doc kernel (tag+link+extract, the pipeline's compute)
over the same documents with a plain multiprocessing.Pool at two worker
counts, and reports (T_lo / T_hi) / (hi / lo) — the compute-only scaling
efficiency with zero scheduler, object store, or exchange involved.

Usage: python tools/mp_ceiling.py [lo=7] [hi=28] [n_docs=40000]
Prints one JSON line. Run it alongside `bench.py --scaling` whenever the
scaling number moves: if THIS ceiling moved too, the delta is host state
(noisy-neighbor memory bandwidth), not an engine regression.
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _init():
    global _STAGE
    from bionext_ray.kb import default_kb
    from bionext_ray.stages.fused import KGFusedStage
    _STAGE = KGFusedStage(default_kb())


def _work(pages):
    """The same per-doc work as the pipeline's actor-pool operator:
    extract (html parse / passthrough) THEN the fused kernel."""
    import pyarrow as pa

    from bionext_ray.html_text import page_text
    texts = [page_text(h, t)[0] for h, t in pages]
    t = pa.table({"doc_id": pa.array([str(i) for i in range(len(texts))],
                                     pa.string()),
                  "text": pa.array(texts, pa.string())})
    return _STAGE(t).num_rows


def _run(texts, workers, chunk=256):
    chunks = [texts[i:i + chunk] for i in range(0, len(texts), chunk)]
    with mp.Pool(workers, initializer=_init) as pool:
        pool.map(_work, chunks[:workers])          # warmup, untimed
        t0 = time.perf_counter()
        n = sum(pool.map(_work, chunks))
        wall = time.perf_counter() - t0
    return wall, n


def measure_ceiling(lo: int = 7, hi: int = 28, n_docs: int = 40_000,
                    pages_dir: str | None = None) -> dict:
    """Measure the host's compute-only N->4N scaling ceiling right now.

    Importable so `bench.py --scaling` can record the ceiling IN THE SAME
    SESSION as every scaling pair (the number swings with neighbor load;
    a ceiling probed hours apart explains nothing). ``pages_dir`` pins the
    probe to the exact corpus the scaling legs consumed; otherwise the
    newest bench corpus cache (or fixture pages) is used.
    """
    # pages = the BENCH corpus when its cache exists (the honest
    # apples-to-apples load: raw (html, text) rows, extraction TIMED like
    # the pipeline's operator), else fixture pages
    import glob
    rows = []
    dirs = ([pages_dir + "/"] if pages_dir and os.path.isdir(pages_dir)
            else sorted(glob.glob("/tmp/bench_pages_*/"))[-1:])
    if dirs:
        import pyarrow.parquet as pq
        for f in sorted(glob.glob(dirs[0] + "*.parquet")):
            t = pq.read_table(f, columns=["html", "text"])
            rows += list(zip(t["html"].to_pylist(), t["text"].to_pylist()))
            if len(rows) >= n_docs:
                break
    if len(rows) < 1000:
        from bionext_ray.fixtures import make_pages
        pg = make_pages(max(n_docs // 8, 1), seed=11)
        rows = list(zip(pg["html"].to_pylist(), pg["text"].to_pylist()))
    texts = (rows * (n_docs // len(rows) + 1))[:n_docs]
    w_hi, _ = _run(texts, hi)
    w_lo, n = _run(texts, lo)
    eff = (w_lo / w_hi) / (hi / lo)
    return {
        "metric": "mp_ceiling", "workers_lo": lo, "workers_hi": hi,
        "sec_lo": round(w_lo, 3), "sec_hi": round(w_hi, 3),
        "docs": n_docs, "ms_per_doc_lo": round(w_lo / n_docs * 1e3, 4),
        "ms_per_doc_hi": round(w_hi / n_docs * 1e3, 4),
        "ceiling_efficiency": round(eff, 3)}


def main():
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
    print(json.dumps(measure_ceiling(lo, hi, n_docs)))


if __name__ == "__main__":
    main()
