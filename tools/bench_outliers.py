#!/usr/bin/env python3
"""Standing load-contamination triage (r16 review #8): given a bench
record (BENCH_SELF.json with {loadavg_*, bench} or a bare Bench JSON
line), print the per-query wall/cpu/gc split for every query whose
shape breaks the calm profile — wall exceeding cpu/cores by 2x (the
process was descheduled or stalled on IO), or GC above 25% of cpu
(heap churn / memory pressure). Paste the table into NOTES before any
code response to a contaminated capture.

Against a BASELINE record (second arg, e.g. the committed calm
BENCH_SELF.json via `git show HEAD:BENCH_SELF.json > /tmp/base.json`)
it flags per-query CPU inflation too: the r16 contaminated capture
showed PROCESS-CPU itself ballooning 3-50x on the big-shuffle queries
(dedup_minhash_bbit 157 cpu-s vs a calm ~3; gc flat) — the signature
of memory-bandwidth contention, where each cpu-second does less work,
NOT of descheduling (wall-only) or heap churn (gc).

Usage: python3 tools/bench_outliers.py [record.json] [baseline.json] [--all]
"""
import json, sys

args = [a for a in sys.argv[1:] if not a.startswith('--')]
show_all = '--all' in sys.argv
path = args[0] if args else 'BENCH_SELF.json'
basepath = args[1] if len(args) > 1 else None

def load(p):
    doc = json.load(open(p))
    return doc, doc.get('bench', doc)

doc, b = load(path)
base = load(basepath)[1] if basepath else None
wall, cpu, gc = b['queries'], b.get('queries_cpu', {}), b.get('queries_gc', {})
la = f" loadavg {doc.get('loadavg_before','?')}->{doc.get('loadavg_after','?')}" \
    if 'loadavg_before' in doc else ''
print(f"# {path}: {len(wall)} queries, total {b.get('value',0):.1f}s wall / "
      f"{b.get('total_cpu',0):.1f}s cpu{la}" +
      (f" | baseline {basepath}" if basepath else ''))
print(f"{'query':42s} {'wall_s':>8s} {'cpu_s':>8s} {'gc_s':>7s} "
      f"{'cpu_x':>6s} {'wall_x':>6s} {'gc/cpu':>7s} flags")
rows = []
for q in wall:
    w, c, g = wall[q], cpu.get(q, 0.0), gc.get(q, 0.0)
    gshare = g / c if c > 0 else 0.0
    bw = base['queries'].get(q) if base else None
    bc = base.get('queries_cpu', {}).get(q) if base else None
    cx = c / bc if bc else None
    wx = w / bw if bw else None
    flags = []
    if w > 1.0 and c > 0 and w / c > 2.0:
        flags.append('WALL>2xCPU')  # descheduled / IO-stalled
    if c > 1.0 and gshare > 0.25:
        flags.append('GC>25%')      # heap churn
    if cx and c > 1.0 and cx > 1.5:
        flags.append(f'CPUx{cx:.1f}')  # bandwidth contention / regression
    if wx and w > 1.0 and wx > 2.0:
        flags.append(f'WALLx{wx:.1f}')
    if flags or show_all:
        rows.append((w, q, c, g, cx, wx, gshare, ','.join(flags)))
for w, q, c, g, cx, wx, gs, fl in sorted(rows, reverse=True):
    cxs = f"{cx:6.2f}" if cx else '     -'
    wxs = f"{wx:6.2f}" if wx else '     -'
    print(f"{q:42s} {w:8.2f} {c:8.2f} {g:7.2f} {cxs} {wxs} {gs:7.2%} {fl}")
if not rows:
    print("(no outliers: calm-profile capture)")
