#!/usr/bin/env python
"""Experiment-01 sweep driver: every RAG mode x answer-permutation x repeat.

Capability parity with the reference batch runner (reference
03_experiment01_run.py:39-96): the CLI flags, the four evaluation modes with
their vector-db/type pairings, the ``--perm_quest Yes`` forwarding, and the
output filename stub ``eval_{short}_{mode}_{perm}_benchmark`` are the compat
surface (the 04 aggregator's filename regex consumes the stub). The sweep
mechanics are this framework's own: the run matrix is materialized up front,
each run is an isolated subprocess of the single-run driver, and per-run
exit codes are collected and reported (the reference silently discards
them), with a non-zero exit if any leg failed.
"""

from __future__ import annotations

import argparse
import dataclasses
import itertools
import subprocess
import sys
import time
from pathlib import Path
from typing import List, Optional

EVAL_SCRIPT = str(Path(__file__).resolve().parent / "02_experiment01.py")
RESULTS_DIR = Path("./results/eval")


@dataclasses.dataclass(frozen=True)
class RunSpec:
    """One leg of the sweep: a (mode, permutation, repeat) combination."""

    mode: str          # filename label: no_RAG / text_RAG / mm_RAG / colpali
    vector_db: str     # collection the eval driver queries ("" = no retrieval)
    eval_type: str     # retrieval engine selector passed to --type
    permute: bool
    repeat: int        # 1-based

    @property
    def perm_label(self) -> str:
        return "perm" if self.permute else "no_perm"

    def output_stub(self, model_short: str) -> Path:
        # Must match the 04 aggregator's FILE_PATTERN regex.
        return RESULTS_DIR / (
            f"eval_{model_short}_{self.mode}_{self.perm_label}_benchmark"
        )


def build_matrix(args: argparse.Namespace) -> List[RunSpec]:
    """The full sweep, permutation-major then repeat then mode (4 modes per
    repeat, mirroring the reference's coverage)."""
    modes = (
        ("no_RAG", "", ""),
        ("text_RAG", args.vd_text_name, "mm_RAG"),
        ("mm_RAG", args.vd_mm_name, "mm_RAG"),
        ("colpali", args.vd_colpali_name, "colpali"),
    )
    return [
        RunSpec(mode=m, vector_db=db, eval_type=ty, permute=perm, repeat=rep)
        for perm, rep, (m, db, ty) in itertools.product(
            (True, False), range(1, args.repeats + 1), modes
        )
    ]


def invoke(spec: RunSpec, args: argparse.Namespace) -> int:
    cmd = [
        sys.executable, EVAL_SCRIPT,
        "--vllm_port", args.vllm_port,
        "--model_name", args.model_name,
        "--filepath_output", str(spec.output_stub(args.model_name_short)),
        "--vector_db", spec.vector_db,
        "--type", spec.eval_type,
        "--top_k", str(args.top_k),
    ]
    for flag, value in (
        ("--qa_path", args.qa_path),
        ("--base-url", args.base_url),
        ("--storage-path", args.storage_path),
        ("--retriever", args.retriever),
        ("--text-encoder-config", args.text_encoder_config),
    ):
        if value:
            cmd += [flag, value]
    if spec.permute:
        cmd += ["--perm_quest", "Yes"]
    return subprocess.call(cmd)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Sweep experiment 01 over RAG modes, permutations and repeats."
    )
    p.add_argument("--vllm_port", required=True, type=str)
    p.add_argument("--model_name", required=True, type=str)
    p.add_argument("--model_name_short", required=True, type=str)
    p.add_argument("--vd_mm_name", required=True, type=str)
    p.add_argument("--vd_colpali_name", required=True, type=str)
    p.add_argument("--vd_text_name", required=True, type=str)
    p.add_argument("--repeats", required=True, type=int)
    p.add_argument("--top_k", default=5, type=int)
    p.add_argument("--qa_path", default=None, help="Forwarded to the eval driver.")
    p.add_argument("--base-url", default=None, help="Forwarded to the eval driver.")
    p.add_argument("--storage-path", default=None, help="Forwarded to the eval driver.")
    p.add_argument("--retriever", default=None, help="Forwarded to the eval driver.")
    p.add_argument("--text-encoder-config", default=None,
                   help="Forwarded to the eval driver.")
    return p.parse_args()


def main() -> None:
    args = parse_args()
    RESULTS_DIR.mkdir(parents=True, exist_ok=True)
    matrix = build_matrix(args)

    sweep_t0 = time.time()
    failures: List[RunSpec] = []
    for n, spec in enumerate(matrix, 1):
        print(
            f"[03] leg {n}/{len(matrix)}: mode={spec.mode} "
            f"db={spec.vector_db or '-'} perm={spec.perm_label} "
            f"repeat={spec.repeat}/{args.repeats} "
            f"(model {args.model_name} @ port {args.vllm_port}, top_k={args.top_k})",
            flush=True,
        )
        leg_t0 = time.time()
        rc = invoke(spec, args)
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"[03] leg {n}/{len(matrix)} {status} in {time.time() - leg_t0:.1f}s",
              flush=True)
        if rc != 0:
            failures.append(spec)

    print(
        f"[03] sweep done: {len(matrix) - len(failures)}/{len(matrix)} legs ok "
        f"in {time.time() - sweep_t0:.1f}s"
    )
    if failures:
        for spec in failures:
            print(f"[03]   failed: {spec}")
        sys.exit(1)


if __name__ == "__main__":
    main()
