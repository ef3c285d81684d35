"""Stats layer tests: CI parity, P@k, cost, merge/iteration counting,
run_ci_summary output format, Wilcoxon."""

import numpy as np
import pandas as pd
import pytest

from multimodal_colpali_tpu.evalstats import (
    agresti_coull_interval, calculate_cost, calculate_precision_at_k,
    calculate_throughput, create_summary_table, format_ci_cell,
    mean_confidence_interval, merge_data, paired_wilcoxon_table, proportion_ci,
    run_ci_summary,
)


def test_agresti_coull_known_value():
    # x=81, n=263 -> ~[0.256, 0.369] (textbook Agresti-Coull example values)
    lo, up = agresti_coull_interval(81, 263)
    assert 0.25 < lo < 0.27
    assert 0.36 < up < 0.38
    # degenerate
    assert np.isnan(proportion_ci(pd.Series([], dtype=float))[0])


def test_mean_ci_matches_scipy_sem():
    s = pd.Series([1.0, 2.0, 3.0, 4.0, 5.0])
    lo, up = mean_confidence_interval(s)
    # t(4, 0.975) = 2.7764, sem = 0.7071 -> 3 +/- 1.9633
    assert lo == pytest.approx(3 - 1.9633, abs=1e-3)
    assert up == pytest.approx(3 + 1.9633, abs=1e-3)
    lo_nn, _ = mean_confidence_interval(pd.Series([0.1, 0.2, 0.15]), non_negative=True)
    assert lo_nn >= 0
    assert np.isnan(mean_confidence_interval(pd.Series([1.0]))[0])


def test_format_ci_cell():
    assert format_ci_cell(0.8284, 0.2110, 1.0) == "0.828\n[0.211, 1.000]"
    assert format_ci_cell(np.nan, 0, 1) == "N/A"
    assert format_ci_cell(0.5, -0.2, 0.9) == "0.500\n[0.000, 0.900]"  # clipped


def test_precision_at_k():
    row = pd.Series({
        "Paper_id": "Paper03",
        "Context_papers": "['paper03_pg_2', 'paper07_pg_1', 'Paper03_pg_9', 'x_pg_1', 'y_pg_2']",
    })
    assert calculate_precision_at_k(row, top_k=5) == pytest.approx(2 / 5)
    assert np.isnan(calculate_precision_at_k(pd.Series({
        "Paper_id": "nan", "Context_papers": "[]"}), top_k=5))
    assert calculate_precision_at_k(pd.Series({
        "Paper_id": "Paper03", "Context_papers": "not-a-list"}), top_k=5) == 0


def test_cost_and_throughput():
    df = pd.DataFrame({
        "Model": ["gpt-5", "gpt-5-nano", "unknown"],
        "Total_tokens": [1_000_000, 2_000_000, 100],
        "Elapsed": [10.0, 20.0, 1.0],
    })
    cost = calculate_cost(df, {"gpt-5": 10, "gpt-5-nano": 0.4})
    assert cost.tolist()[:2] == [10.0, 0.8]
    assert np.isnan(cost.tolist()[2])
    assert calculate_throughput(df).tolist() == [100000.0, 100000.0, 100.0]


def _fake_eval_csvs(tmp_path, n_iters=3, n_q=20, seed=0):
    rng = np.random.default_rng(seed)
    for model, ret in [("gpt-5", "colpali"), ("gpt-5", "colflor")]:
        for it in range(n_iters):
            df = pd.DataFrame({
                "Question_nr": np.arange(1, n_q + 1),
                "Paper_id": [f"Paper{i:02d}" for i in rng.integers(0, 5, n_q)],
                "Model": model,
                "Model_ret": ret,
                "Answer": rng.choice(list("ABCD"), n_q),
                "Context_papers": ["['Paper01_pg_1','Paper02_pg_2']"] * n_q,
                "Cor_answer": rng.integers(0, 2, n_q),
                "Elapsed": rng.uniform(5, 20, n_q),
                "Total_tokens": rng.integers(1000, 9000, n_q),
                "Difficulty": rng.choice(["Easy", "Medium", "Hard"], n_q),
            })
            df.to_csv(tmp_path / f"eval_{ret}_{model}_{it}.csv", index=False)
    return str(tmp_path) + "/"


def test_merge_data_iteration_counting(tmp_path):
    path = _fake_eval_csvs(tmp_path)
    merged = merge_data(path)
    assert set(merged["Iteration"].unique()) == {1, 2, 3}
    per_combo = merged.groupby(["Model", "Model_ret"])["Iteration"].nunique()
    assert (per_combo == 3).all()


def test_run_ci_summary_shapes_and_format(tmp_path):
    path = _fake_eval_csvs(tmp_path)
    per_iter, table, merged = run_ci_summary(
        path, ["Model", "Model_ret"], price_dict={"gpt-5": 10}, top_k=5,
    )
    assert {"Cor_answer", "Elapsed", "Total_tokens", "P@5", "Throughput",
            "Cost", "Correct_answers", "Price-per-cost"} <= set(per_iter.columns)
    assert len(per_iter) == 6  # 2 combos x 3 iterations
    assert len(table) == 2
    cell = table["Cor_answer"].iloc[0]
    assert "\n[" in cell and cell.endswith("]")
    # P@5 column on merged rows exists and is within [0, 1]
    assert merged["P@5"].dropna().between(0, 1).all()


def test_create_summary_table_proportion(tmp_path):
    path = _fake_eval_csvs(tmp_path)
    merged = merge_data(path)
    out = create_summary_table(
        merged, ["Model", "Model_ret"], {"Cor_answer": "proportion"},
        return_numeric=True,
    )
    assert "mean_Cor_answer" in out.columns
    assert ((out["ci_low_Cor_answer"] <= out["mean_Cor_answer"]) &
            (out["mean_Cor_answer"] <= out["ci_upp_Cor_answer"])).all()


def test_paired_wilcoxon():
    rng = np.random.default_rng(0)
    n = 60
    rows = []
    for q in range(n):
        base = rng.integers(0, 2)
        rows.append({"Model": "m", "Model_ret": "weak", "Question_nr": q,
                     "Cor_answer": base})
        # 'strong' flips ~30% of wrong answers to right -> should differ
        rows.append({"Model": "m", "Model_ret": "strong", "Question_nr": q,
                     "Cor_answer": 1 if base or rng.random() < 0.5 else 0})
    df = pd.DataFrame(rows)
    out = paired_wilcoxon_table(df)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_items"] == n
    assert r["mean_b"] >= r["mean_a"] or r["mean_a"] >= r["mean_b"]
    assert 0 <= r["p_value"] <= 1


def test_wilcoxon_driver_cli(tmp_path):
    import subprocess, sys, os
    from pathlib import Path

    path = _fake_eval_csvs(tmp_path / "evals" if (tmp_path / "evals").mkdir() or True else None)
    env = dict(os.environ)
    repo = Path(__file__).resolve().parent.parent
    env["PYTHONPATH"] = f"{repo}:{env.get('PYTHONPATH','')}"
    env["MMCP_JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "stats.xlsx"
    r = subprocess.run([sys.executable, str(repo / "drivers" / "02a_stat_test.py"),
                        "--input", str(tmp_path / "evals"),
                        "--output", str(out)],
                       env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    df = pd.read_csv(tmp_path / "stats.csv")
    assert {"Model", "group_a", "group_b", "p_value", "p_bonferroni"} <= set(df.columns)
    assert len(df) == 1  # one model, one augmentation pair


def test_wilcoxon_uses_r_approximation_with_correction():
    """ADVICE r1: must match R's wilcox.test(paired=TRUE, exact=FALSE)
    (normal approximation WITH continuity correction), not scipy defaults
    (exact test for small n). Golden p-value pinned for a 10-item pair."""
    import pandas as pd

    from multimodal_colpali_tpu.evalstats.wilcoxon import paired_wilcoxon_table

    x = [1, 1, 0, 1, 0, 1, 1, 0, 1, 1]
    y = [0, 1, 1, 1, 0, 0, 1, 0, 0, 1]
    rows = []
    for i, (a, b) in enumerate(zip(x, y)):
        rows.append({"Model": "m", "Model_ret": "colpali", "Question_nr": i,
                     "Cor_answer": a})
        rows.append({"Model": "m", "Model_ret": "no_RAG", "Question_nr": i,
                     "Cor_answer": b})
    out = paired_wilcoxon_table(pd.DataFrame(rows))
    assert len(out) == 1
    # scipy(zero_method='wilcox', correction=True, method='approx') == R
    assert out["p_value"].iloc[0] == pytest.approx(0.4237107971667934)
