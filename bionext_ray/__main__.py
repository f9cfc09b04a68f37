"""CLI entry point — the reference's ``python main.py <input> [-t -l -e]``
surface (/root/reference/main.py) re-expressed over Ray Data.

    python -m bionext_ray pages.parquet -t -l -e --output /tmp/kg_out
    python -m bionext_ray corpus_dir_of_bioc_json -t -l --format bioc

Module toggles compose the same way as the reference (main.py:75-83),
including the rejected tagger+extractor-without-linker combination. Output is
checkpointed per stage under --output (resume by re-running). This script
OWNS its Ray session (guarded init + shutdown); library code never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bionext_ray",
        description="Ray-Data-native BioNExt-capability KG pipeline")
    p.add_argument("source", help="pages parquet file/dir, or BioC JSON "
                                  "file/dir with --format bioc")
    p.add_argument("-t", "--tagger", action="store_true", default=False)
    p.add_argument("-l", "--linker", action="store_true", default=False)
    p.add_argument("-e", "--extractor", action="store_true", default=False)
    p.add_argument("--format", choices=["pages", "bioc"], default="pages")
    p.add_argument("--output", default="/tmp/bionext_ray_out")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--concurrency", type=int, default=None,
                   help="actor pool max size (default: cluster CPUs)")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="ray.init num_cpus (default: all)")
    p.add_argument("--num-gpus", type=float, default=None,
                   help="per-actor GPU fraction for the model stages "
                        "(map_batches num_gpus; default: none — correct "
                        "for the surrogate CPU backends)")
    p.add_argument("--llm-api-module", default=None,
                   help="GenericAPICall plugin ('Module' or 'pkg.mod:Cls')")
    p.add_argument("--llm-api-address", default=None)
    p.add_argument("--model-backend", choices=["direct", "adapter"],
                   default="direct",
                   help="'direct' = in-stage surrogate fast paths; "
                        "'adapter' = the model-backend protocol "
                        "(batched input_ids/attention_mask per forward — "
                        "the path a real transformer uses; see "
                        "bionext_ray.models). Both produce identical "
                        "output (pinned by the parity suite).")
    return p


def validate_modules(args) -> None:
    # reference rejects tagger+extractor without linker (main.py:75-83)
    if args.tagger and args.extractor and not args.linker:
        raise SystemExit(
            "invalid module combination: tagger+extractor requires linker")
    if not (args.tagger or args.linker or args.extractor):
        raise SystemExit("pick at least one of -t/-l/-e")


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    validate_modules(args)

    import os

    import ray
    if not ray.is_initialized():
        # under `ray job submit` the runtime injects RAY_ADDRESS for the
        # running cluster — honor it so the same command works on a real
        # cluster and in local mode (sandbox presets RAY_ADDRESS=local)
        kwargs = {"address": os.environ.get("RAY_ADDRESS", "local"),
                  "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    try:
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
        import ray.data

        from .kb import default_kb
        from .runtime import CheckpointRunner
        from .stages.extract import extract_stage
        from .stages.extractor import extractor_stage
        from .stages.linker import linker_stage
        from .stages.tagger import tagger_stage

        kb = default_kb()
        if args.concurrency:
            # honor an explicit cap exactly (a user-requested 1 must not
            # become a 2-actor pool)
            conc = (1, max(1, args.concurrency))
        else:
            # shared sizing rule: cap below the CPU count so upstream read
            # tasks keep slots (a pool equal to num_cpus starves them)
            from .ops.relational import actor_pool_size
            conc = actor_pool_size()
        tag_backend = ext_backend = None
        if args.model_backend == "adapter":
            from .models import (SurrogateExtractorBackend,
                                 SurrogateTaggerBackend)
            tag_backend = SurrogateTaggerBackend(kb.gazetteer)
            ext_backend = SurrogateExtractorBackend()
        llm_spec = None
        if args.llm_api_module:
            llm_spec = {"module": args.llm_api_module,
                        "kwargs": {"address": args.llm_api_address}}

        if args.format == "bioc":
            from .sources.bioc import read_bioc_json
            ds = read_bioc_json(args.source)
        else:
            ds = extract_stage(ray.data.read_parquet(args.source))

        runner = CheckpointRunner(args.output, input_fingerprint=args.source)
        if args.format == "pages":
            ds = runner.stage("docs", lambda: ds)
        if args.tagger:
            tagged = ds
            ds = runner.stage(
                "tagged", lambda: tagger_stage(tagged, kb.gazetteer,
                                               concurrency=conc,
                                               batch_size=args.batch_size,
                                               backend=tag_backend,
                                               num_gpus=args.num_gpus))
        if args.linker:
            to_link = ds
            ds = runner.stage(
                "linked", lambda: linker_stage(to_link, kb, concurrency=conc,
                                               batch_size=args.batch_size,
                                               llm_spec=llm_spec,
                                               num_gpus=args.num_gpus))
        if args.extractor:
            linked = ds
            triples = runner.stage(
                "triples", lambda: extractor_stage(linked, concurrency=conc,
                                                   batch_size=args.batch_size,
                                                   backend=ext_backend,
                                                   num_gpus=args.num_gpus))
            from .stages.canonicalize import canonicalize_stage, materialize_graph
            canonical = runner.stage(
                "canonical", lambda: canonicalize_stage(triples))
            materialize_graph(canonical, f"{args.output}/graph")
        print(json.dumps(runner.summary(), indent=2))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
