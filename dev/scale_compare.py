#!/usr/bin/env python3
"""Scale-linearity evidence (r8 verdict item 8): compare two full bench
maps (sf0.1 vs synthetic sf1 = 10x facts) and report the per-query and
per-family scaling factor. A factor near 10 on a fact-bound query is
linear; near 1 means scheduling-floor-bound; well above 10 flags a
superlinear suspect to investigate.

Usage: python3 dev/scale_compare.py <bench_small.json> <bench_big.json>
"""
import json
import re
import sys


FAMILIES = [
    ("scan/scalar", r"^q_(scan|project|filter|case_when|nested_get|epoch_ts|"
                    r"ts_offset|array_join|string_fmt|str_funcs|date_funcs|"
                    r"math_funcs|json_funcs|array_funcs|map_funcs)$"),
    ("join", r"^q_(join|cross)"),
    ("agg", r"^q_(agg|anomaly|funnel|retention)"),
    ("window", r"^q_(win|sessionize)"),
    ("setops/page", r"^q_(sort|limit|page|topk|union|intersect|except|dedup|"
                    r"upsert|scd2|subq|cte|pivot|unpivot|distinct_on|lateral|"
                    r"recursive_cte)"),
    ("streaming-batch", r"^q_s_"),
    ("dedup-x", r"^q_x_(exact_dedup|near_dedup|allpairs|dup_|containment|"
                r"dedup_|incr_dedup|incr_near|simhash|span_dedup|semantic|"
                r"source_xdup|fingerprint|cdc_chunks|frame_dedup)"),
    ("ann/vector", r"^q_x_(knn|ann_|cos_pairs|quantize|rand_proj|vec_stats|"
                   r"hard_neg|semantic|pca|kmeans|label_noise|rrf)"),
    ("text-x", r"^q_x_(text|tfidf|bm25|lm_score|token|top_terms|quality|"
               r"lang_id|rep_ngrams|entropy|ngram|bpe|postings|search|zipf|"
               r"vocab|chunks|redact|normalize|pmi)"),
    ("graph", r"^q_x_(triangles|kcore|lpa|dbscan|pagerank|assortativity|"
              r"blocking|fuzzy)"),
    ("stats-x", r"^q_x_(mann_whitney|anova|spearman|kendall|isotonic|linreg|"
                r"holt|interp|auc|acf|gini|benford|ks|seasonality|wmedian|"
                r"ece|robust_z|theil|mi$|chisq|survival|ab_test|ess|corr|"
                r"bootstrap|winsorize|outlier|psi|kl_source|changepoint|"
                r"quality_corr|burstiness|confusion|kappa|ewma_batch|"
                r"rolling_median|quantile_norm|levene|mcnemar|cohens_d|"
                r"mann_kendall|durbin_watson|js_divergence|entropy_rate|"
                r"cusum|runs_test|simpson|grubbs|qq_shift|decile_lift)"),
    ("other-x", r"^q_x_"),
]


def family(q):
    for name, pat in FAMILIES:
        if re.match(pat, q):
            return name
    return "other"


def main(small_path, big_path):
    small = json.load(open(small_path))["queries"]
    big = json.load(open(big_path))["queries"]
    shared = sorted(set(small) & set(big))
    fams = {}
    rows = []
    for q in shared:
        a, b = small[q], big[q]
        f = b / a if a > 0 else float("inf")
        rows.append((f, q, a, b))
        fams.setdefault(family(q), []).append((f, a, b))
    rows.sort(reverse=True)
    print(f"{'query':34s} {'sf0.1':>8s} {'sf1':>8s} {'factor':>7s}")
    for f, q, a, b in rows[:25]:
        print(f"{q:34s} {a:8.3f} {b:8.3f} {f:7.2f}")
    print("\nPer-family (sum of times):")
    print(f"{'family':18s} {'n':>3s} {'sf0.1':>9s} {'sf1':>9s} {'factor':>7s}")
    for name, items in sorted(fams.items()):
        sa = sum(a for _, a, _ in items)
        sb = sum(b for _, _, b in items)
        print(f"{name:18s} {len(items):3d} {sa:9.2f} {sb:9.2f} {sb / sa:7.2f}")
    ta = sum(small[q] for q in shared)
    tb = sum(big[q] for q in shared)
    print(f"\nTOTAL {ta:.1f}s -> {tb:.1f}s  factor {tb / ta:.2f} on 10x facts")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
