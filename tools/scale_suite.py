#!/usr/bin/env python3
"""Standing scale-rehearsal suite (sf1 + sf4) — the per-round trend
harness for the dedup/curation/ANN/graph heavy hitters.

Generates the two rehearsal fixtures if absent (deterministic, so
regeneration is byte-identical), benches the SUITE queries at both
scales via graft.Bench (reps=2: cold + warm), pulls the committed
sf0.1 numbers from BENCH_SELF.json, and writes BENCH_SELF_sf4.json
with per-query sf0.1/sf1/sf4 cold+min numbers and the scale ratios —
so superlinear creep is caught by a diff, not an audit.

Usage: python3 tools/scale_suite.py [note text]
Run from the repo root. Takes ~20-40 min (fixture gen + 2 benches).
"""
import json, os, re, subprocess, sys

SF1_DIR = '/tmp/graft_sf1'
SF4_DIR = '/tmp/graft_sf4'
SF16_DIR = '/tmp/graft_sf16'
# 4x sf1 on the doc/vec axes, full star at 40x the driver's sf0.1
SF1_GEN = ['50000', '20000', 'full', '10']
SF4_GEN = ['200000', '80000', 'full', '40']
# third rung (r16 review: one doubling cannot separate n log n from
# n^2; two can) — 4x sf4 again, ~3 GB fixture
SF16_GEN = ['800000', '320000', 'full', '160']

SUITE = [
    'corpus_curation_pipeline',          # DEFAULT banded path (r15 routing)
    'dedup_minhash_lsh',
    'dedup_simhash',
    'dedup_clusters',
    'dedup_exact',
    'semantic_dedup',
    'ann_ivf_topk',
    'knn_classify_ann',                  # IVF-routed classifier (r15 gate)
    'knn_graph_ann',
    'graph_coreness_distributed',        # distributed peel (r15 gate)
    'page_rank_personalized',
    'entity_resolution',                 # pair-budget-bounded blocking (r15)
    'file_manifest_stats',
    'winnow_overlap',
    # store/incremental family (r16: none of these were in the suite,
    # yet exactly this class misbehaved in the r15 load-contaminated
    # capture — video_dedup_incremental 0.92 -> 62 s wall, 2.8 -> 336 s
    # CPU; the r16 contention trio + the persisted-store ingest shapes)
    'video_dedup_incremental',
    'image_dedup_incremental',
    'dedup_incremental_minhash_persisted',
    'dedup_incremental_spans_persisted',
    'bm25_absorb_search',
    'agg_store_absorb',
    # the other two r15 contention outliers (both non-store)
    'countmin_heavyhitters',
    'vocab_coverage',
]
# r18: the three r17 sf16 exclusions are RE-ADMITTED — their fixes
# landed (all mechanisms in SCALE.md round-17, fixes in r18 commits):
# - dedup_clusters / dedup_minhash_lsh: LshTuning.pickSized deepens
#   rows-per-band with corpus size (8x4 at every gate SF, (4,8) from
#   the sf1 rung) and the per-bucket budget tightens above 10^5 docs,
#   so the n^2 false-positive candidate growth of the FIXED 8x4 form
#   (1107 s cold / OOM at 800k docs, r17) is gone by construction;
# - entity_resolution: blocking-key depth scales with corpus size
#   (4 digits at gate SFs up to 6) and the blocking pass rides the
#   same in-plan global pair gate as the dedup family, replacing the
#   r17 AGGREGATE_OUT_OF_MEMORY with a loud bounded plan.
SF16_EXCLUDE = set()
# deliberately excluded at sf4 (all with measured reasons, r14/r15):
# - corpus_curation_pipeline_lossless / dedup_prefix_jaccard: the
#   LOSSLESS prefix chain is inherently superquadratic on the
#   fixed-vocabulary fixture (208.8s cold at 200k docs, r14) — that is
#   the documented reason the BANDED path is the default;
# - corpus_curation_pipeline_minhash: its VERDICT GENERATOR is the
#   lossless chain (agreement gate), so its sf4 cold is the lossless
#   number again (286s measured r15) — it verifies at gate SFs;
# - knn_classify (brute force): O(corpus x queries) with a query set
#   that grows with the corpus — quadratic by construction (208s warm
#   at sf4, r15); knn_classify_ann is the corpus-scale route and IS in
#   the suite.


def run(cmd, env=None):
    e = dict(os.environ)
    e.update(env or {})
    print('>>', ' '.join(cmd), flush=True)
    return subprocess.run(cmd, env=e, capture_output=True, text=True)


def ensure_fixture(path, gen):
    if os.path.isdir(f'{path}/lineitem.parquet'):
        print(f'fixture {path} present', flush=True)
        return
    r = run(['sbt', '-batch', f"runMain graft.ScaleFixture {path} {' '.join(gen)}"])
    if r.returncode != 0:
        sys.exit(f'fixture gen failed for {path}:\n{r.stdout[-2000:]}')


def bench(sfdir):
    qs = [q for q in SUITE
          if not (sfdir == SF16_DIR and q in SF16_EXCLUDE)]
    env = {'SPARK_GRAFT_SF_DIR': sfdir,
           'SPARK_GRAFT_BENCH_ONLY': ','.join(qs),
           'SPARK_GRAFT_BENCH_EXACT': '1',
           'SPARK_GRAFT_BENCH_REPS': '2'}
    # the sf16 fixture (3.2 GB) needs more than the 8g sandbox
    # default (dedup-family staging OOM'd the shared local[32] JVM at
    # 8g, r17) — but the override is scoped to the sf16 rung ONLY
    # (r18 review): sf1/sf4 run at the same 8g heap as the committed
    # sf0.1 baseline, so their ratios measure data scaling, not
    # GC-regime changes. Each rung's heap is recorded in the output.
    if sfdir == SF16_DIR:
        env['SPARK_DRIVER_MEM'] = '32g'
    r = run(['sbt', '-batch', 'runMain graft.Bench'], env=env)
    # surface per-query lines and failures into this script's log
    for l in (r.stdout + r.stderr).splitlines():
        if '[bench]' in l:
            print(l, flush=True)
    # the FULL per-query line (Bench also prints a compact trailer
    # line for the driver's tail capture — that one has no
    # queries_cold/min and must not be picked)
    m = [l for l in r.stdout.splitlines() if '"queries_cold"' in l]
    if not m:
        sys.exit(f'bench at {sfdir} emitted no full JSON line:\n{r.stdout[-3000:]}')
    return json.loads(re.sub(r'^\[info\]\s*', '', m[-1]))


def loadavg():
    return open('/proc/loadavg').read().split()[0]


def main():
    # optional flag: --sf16 adds the third rung (4x sf4) and writes
    # BENCH_SELF_sf16.json with BOTH doubling ratios per query — the
    # trend pair that separates n log n from n^2
    args = [a for a in sys.argv[1:] if a != '--sf16']
    with_sf16 = '--sf16' in sys.argv[1:]
    note = args[0] if args else ''
    la0 = loadavg()
    ensure_fixture(SF1_DIR, SF1_GEN)
    ensure_fixture(SF4_DIR, SF4_GEN)
    if with_sf16:
        ensure_fixture(SF16_DIR, SF16_GEN)
    b1 = bench(SF1_DIR)
    b4 = bench(SF4_DIR)
    b16 = bench(SF16_DIR) if with_sf16 else None
    sf01 = {}
    try:
        sf01 = json.load(open('BENCH_SELF.json'))['bench']
    except Exception:
        pass
    trend = {}
    for q in SUITE:
        row = {
            'sf01_min': sf01.get('queries_min', {}).get(q),
            'sf1_cold': b1['queries_cold'].get(q),
            'sf1_min': b1['queries_min'].get(q),
            'sf4_cold': b4['queries_cold'].get(q),
            'sf4_min': b4['queries_min'].get(q),
        }
        if row['sf1_min'] and row['sf4_min']:
            row['sf4_over_sf1_min'] = round(row['sf4_min'] / row['sf1_min'], 2)
        if row['sf1_cold'] and row['sf4_cold']:
            row['sf4_over_sf1_cold'] = round(row['sf4_cold'] / row['sf1_cold'], 2)
        if b16 is not None:
            row['sf16_cold'] = b16['queries_cold'].get(q)
            row['sf16_min'] = b16['queries_min'].get(q)
            if row['sf4_min'] and row['sf16_min']:
                row['sf16_over_sf4_min'] = round(row['sf16_min'] / row['sf4_min'], 2)
            if row['sf4_cold'] and row['sf16_cold']:
                row['sf16_over_sf4_cold'] = round(row['sf16_cold'] / row['sf4_cold'], 2)
        trend[q] = row
    doc = {
        'note': note or ('standing sf1/sf4 scale suite: 4x data sf1->sf4; a healthy '
                         'row shows sf4_over_sf1 <= ~4 (linear) on cold and min'),
        'fixtures': {'sf1': f'{SF1_DIR} {" ".join(SF1_GEN)}',
                     'sf4': f'{SF4_DIR} {" ".join(SF4_GEN)}'},
        'driver_heap': {'sf1': '8g (default)', 'sf4': '8g (default)',
                        'sf16': '32g'},
        'loadavg_before': la0,
        'loadavg_after': loadavg(),
        'suite_sf1': b1,
        'suite_sf4': b4,
        'trend': trend,
    }
    if b16 is not None:
        doc['fixtures']['sf16'] = f'{SF16_DIR} {" ".join(SF16_GEN)}'
        doc['suite_sf16'] = b16
        out = 'BENCH_SELF_sf16.json'
    else:
        out = 'BENCH_SELF_sf4.json'
    with open(out, 'w') as f:
        json.dump(doc, f, indent=1, sort_keys=False)
    print(f'wrote {out}', flush=True)
    for q, r in trend.items():
        line = (f"{q:36s} sf1_min {r['sf1_min']} sf4_min {r['sf4_min']} "
                f"ratio {r.get('sf4_over_sf1_min')}")
        if b16 is not None:
            line += f" sf16_min {r.get('sf16_min')} ratio16 {r.get('sf16_over_sf4_min')}"
        print(line, flush=True)


if __name__ == '__main__':
    main()
