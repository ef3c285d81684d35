#!/usr/bin/env python
"""Aggregate Experiment-01 pickles: accuracy by difficulty + majority vote.

Behavior parity with the reference aggregator (04_experiment01_eval.py:20-193):
same FILE_PATTERN regex over pickle names, same benchmark merge on
Question_nr, same difficulty pivot and >= ceil(n/2) majority vote, same three
output tables (Excel when an engine exists, CSV fallback otherwise).
"""

from __future__ import annotations

import argparse
import pickle
import re
import sys
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_colpali_tpu.utils.io import read_table, write_table

BENCHMARK_FILE = "./data/Glycans_q_a_v5.xlsx"
SUMMARY_PATH = Path("results/eval_results.xlsx")
MAJORITY_PATH = Path("results/eval_maj_results.xlsx")
FULL_PATH = Path("results/eval_full_results.xlsx")

# Non-greedy vd_name: the reference's greedy ``.+`` (04_experiment01_eval.py:28)
# swallows the ``_no`` of ``no_perm`` ("colpali_no_perm" -> vd_name
# "colpali_no"), which NaNs the vd_name categorical downstream and silently
# drops every non-permuted run from the summaries.
FILE_PATTERN = re.compile(
    r"eval_(?P<model_short>[^_]+)_(?P<vd_name>.+?)_(?P<perm_flag>perm|no_perm)_benchmark_(?P<timestamp>\d{8}-\d{6})$"
)


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Summarise Experiment 01 evaluation pickles.")
    p.add_argument("--eval-dir", default="results/eval")
    p.add_argument("--benchmark-path", default=BENCHMARK_FILE)
    p.add_argument("--summary-path", default=str(SUMMARY_PATH))
    p.add_argument("--majority-path", default=str(MAJORITY_PATH))
    p.add_argument("--full-path", default=str(FULL_PATH))
    return p.parse_args()


def parse_metadata(path: Path) -> dict | None:
    stem = path.stem.removesuffix("_perm_q")
    m = FILE_PATTERN.match(stem)
    if not m:
        return None
    d = m.groupdict()
    d["perm_label"] = d.pop("perm_flag")
    return d


def build_dataframe(eval_dir: Path) -> pd.DataFrame:
    frames = []
    for pkl_path in sorted(eval_dir.glob("eval_*.pkl")):
        meta = parse_metadata(pkl_path)
        if meta is None:
            print(f"[skip] unrecognized filename: {pkl_path.name}")
            continue
        with pkl_path.open("rb") as fh:
            blob = pickle.load(fh)
        df = pd.DataFrame(blob["evaluation"])
        df["model"] = blob.get("model")
        df["model_short"] = meta["model_short"]
        df["vd_name"] = meta["vd_name"]
        df["elapsed_time"] = blob.get("elapsed_time")
        df["run_timestamp"] = blob.get("timestamp", meta["timestamp"])
        df["file_timestamp"] = meta["timestamp"]
        df["permuted_answers"] = blob.get("permuted_answers", meta["perm_label"] == "perm")
        df["filepath"] = str(pkl_path)
        frames.append(df)
    if not frames:
        raise SystemExit(f"no eval pickles found in {eval_dir}")
    return pd.concat(frames, ignore_index=True)


def compute_majority_vote(df: pd.DataFrame) -> pd.DataFrame:
    grouped = (
        df.groupby(
            ["model_short", "model", "vd_name", "permuted_answers", "Question_nr", "Difficulty"],
            observed=True,
        )["Cor_answer"].agg(["sum", "count"]).reset_index()
    )
    grouped["Maj_vote"] = (grouped["sum"] >= np.ceil(grouped["count"] / 2)).astype(int)
    return (
        grouped.groupby(["model_short", "model", "vd_name", "permuted_answers"],
                        observed=True)["Maj_vote"].mean().reset_index()
    )


def compute_summary_tables(df: pd.DataFrame) -> pd.DataFrame:
    pivot = pd.pivot_table(
        df, values="Cor_answer",
        index=["model_short", "model", "vd_name", "permuted_answers"],
        columns="Difficulty", aggfunc="mean", observed=True,
    )
    return pivot.reindex(columns=["Easy", "Medium", "Hard"])


def main() -> None:
    args = parse_args()
    benchmark = read_table(args.benchmark_path)
    merged = build_dataframe(Path(args.eval_dir)).merge(
        benchmark[["Question_nr", "Correct", "Difficulty"]],
        on="Question_nr", how="left",
    )
    merged["Cor_answer"] = (merged["answer"] == merged["Correct"]).astype(int)
    merged["Difficulty"] = pd.Categorical(
        merged["Difficulty"], categories=["Easy", "Medium", "Hard"], ordered=True)
    merged["vd_name"] = pd.Categorical(
        merged["vd_name"], categories=["no_RAG", "text_RAG", "mm_RAG", "colpali"],
        ordered=True)

    full_path = write_table(
        merged.sort_values(["model_short", "vd_name", "permuted_answers", "Question_nr"]),
        args.full_path)
    summary_path = write_table(compute_summary_tables(merged).reset_index(),
                               args.summary_path)
    majority_path = write_table(compute_majority_vote(merged), args.majority_path)

    print(f"[done] Summary saved to {summary_path}")
    print(f"[done] Majority vote saved to {majority_path}")
    print(f"[done] Full evaluations saved to {full_path}")


if __name__ == "__main__":
    main()
