#!/usr/bin/env python3
"""Scale-curve analysis: read bench JSON lines from multiple scale factors
and emit a per-family markdown table of time ratios and scaling exponents.

Usage: python3 tools/scaling.py sf1=path1.json sf2=path2.json ...
       (first argument is the BASE scale factor)

Exponent per family: least-squares slope of log(total_time) vs log(sf)
over the given points — 1.0 = linear in data, <1 = fixed overhead
amortizing away, >1 = superlinear (needs a named cause or a fix).
Queries that timed out (-1) or are missing at any sf are listed
separately and excluded from the fit.
"""
import sys, json, math, re
from collections import defaultdict

FAMILIES = [
    ("classical q-rows", re.compile(r"^q\d+")),
    ("ANN retrieval", re.compile(r"^op_ann_|^op_topk|^op_pca|^op_purge_ann")),
    ("dedup (exact/minhash/simhash/jaccard)", re.compile(r"^dedup_")),
    ("embedding near-dup / semantic", re.compile(r"^neardup_|^op_cluster|^corpus_cluster|^pipeline_semantic|^pipeline_embedding")),
    ("decontamination / curation", re.compile(r"^text_decontaminate|^fuzzy_|^semantic_decontaminate|^curation_|^pipeline_curation$|^corpus_report|^pipeline_contamination")),
    ("text analysis", re.compile(r"^text_(?!bm25|bpe|decontaminate)")),
    ("BM25 / hybrid retrieval", re.compile(r"^text_bm25|^text_hybrid")),
    ("BPE tokenizer", re.compile(r"^text_bpe")),
    ("ML scoring (forest/mlp/als/calibrate/eval)", re.compile(r"^ml_")),
    ("feature engineering", re.compile(r"^op_(categorify|standard|bucketize|target|join_groupby|hash_bucket|fill|clip|list_slice|unroll|padding|concat|feature|embedding_lookup|asof|materialize)|^pipeline_feature")),
    ("corpus log / versioned state", re.compile(r"^pipeline_ingest|^op_purge_corpus|^op_compact_corpus|^op_publish|^snapshot_diff|^op_corpus|^pipeline_incremental")),
    ("storage / layout", re.compile(r"^op_compact_files|^op_zorder|^op_schema|^op_bucketed|^op_csv|^op_json|^op_orc|^op_dpp|^op_partition")),
    ("multimodal", re.compile(r"^multimodal_|^op_sample_frames|^op_media")),
    ("sampling / mixture / skew", re.compile(r"^op_softmax|^op_mixture|^op_skew|^op_salted|^pipeline_dsir|^pipeline_mix|^op_shard|^pack_chunks|^op_upsample")),
    ("streaming lifecycle", re.compile(r"_stream$|^op_session|^op_trailing")),
    ("flagship pipelines", re.compile(r"^pipeline_")),
    ("other ops", re.compile(r"")),
]


def family_of(q):
    for name, rx in FAMILIES:
        if rx.search(q):
            return name
    return "other ops"


def main():
    runs = []  # (sf, {query: sec})
    for arg in sys.argv[1:]:
        sf, path = arg.split("=", 1)
        line = open(path).read().strip().splitlines()[-1]
        j = json.loads(line)
        runs.append((float(sf), j["queries"]))
    base_sf, base_q = runs[0]
    common = set(base_q)
    for _, q in runs[1:]:
        common &= set(q)
    excluded = sorted(
        q for q in common
        if any(qs.get(q, -1) is None or qs.get(q, -1) < 0 for _, qs in runs))
    usable = sorted(common - set(excluded))

    fam_tot = {sf: defaultdict(float) for sf, _ in runs}
    for q in usable:
        f = family_of(q)
        for sf, qs in runs:
            fam_tot[sf][f] += qs[q]

    sfs = [sf for sf, _ in runs]
    print("| family | " + " | ".join(f"sf{sf} (s)" for sf in sfs) +
          " | ratio | exponent |")
    print("|---" * (len(sfs) + 3) + "|")
    rows = []
    for fname, _ in FAMILIES:
        ts = [fam_tot[sf].get(fname, 0.0) for sf in sfs]
        if ts[0] <= 0:
            continue
        # least-squares slope of log t vs log sf
        xs = [math.log(sf) for sf in sfs]
        ys = [math.log(max(t, 1e-3)) for t in ts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys)) /
                 sum((x - mx) ** 2 for x in xs))
        rows.append((fname, ts, ts[-1] / ts[0], slope))
    for fname, ts, ratio, slope in rows:
        print(f"| {fname} | " + " | ".join(f"{t:.1f}" for t in ts) +
              f" | {ratio:.2f}x | {slope:.2f} |")
    tot = [sum(fam_tot[sf].values()) for sf in sfs]
    xs = [math.log(sf) for sf in sfs]
    ys = [math.log(t) for t in tot]
    n = len(xs); mx, my = sum(xs)/n, sum(ys)/n
    slope = (sum((x-mx)*(y-my) for x, y in zip(xs, ys)) /
             sum((x-mx)**2 for x in xs))
    print(f"| **total ({len(usable)} queries)** | " +
          " | ".join(f"{t:.1f}" for t in tot) +
          f" | {tot[-1]/tot[0]:.2f}x | {slope:.2f} |")
    if excluded:
        print(f"\nexcluded (timeout/missing at some sf): {', '.join(excluded)}")


if __name__ == "__main__":
    main()
