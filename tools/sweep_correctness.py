#!/usr/bin/env python3
"""Standing above-gate correctness sweep (oracle-side tooling — uses
the driver-side DuckDB oracle, NOT part of the engine).

Runs every oracle_sql.json entry against a Verify dump at a chosen
scale factor, one subprocess per query with a hard budget, and writes
a committed JSON artifact so the per-round invariant is "the full
board is green ABOVE the gate SF", not a one-off heroic run.

Usage:
  sbt -batch "runMain graft.Verify <sfdir> <outdir>"
  python3 tools/sweep_correctness.py <sfdir> <outdir> <budget_s> <artifact.json>

e.g.
  python3 tools/sweep_correctness.py /root/testdata/sf0.1 /tmp/verify_sf01 \
      200 CORRECTNESS_SELF_sf01.json
"""
import json, os, subprocess, sys, concurrent.futures as cf

sf, out, budget, artifact = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
here = os.path.dirname(os.path.abspath(__file__))
names = sorted(json.load(open(f'{out}/oracle_sql.json')))

def run(n):
    try:
        r = subprocess.run(
            ['python3', os.path.join(here, 'oracle_check.py'), sf, out, n],
            capture_output=True, text=True, timeout=budget)
        if '1/1 OK' in r.stdout:
            return (n, 'OK')
        return (n, 'FAIL:' + r.stdout.strip()[:300])
    except subprocess.TimeoutExpired:
        return (n, 'ORACLE_TIMEOUT')

res = {}
with cf.ThreadPoolExecutor(4) as ex:
    for n, s in ex.map(run, names):
        res[n] = s
        if s != 'OK':
            print(n, s, flush=True)

ok = sum(1 for s in res.values() if s == 'OK')
doc = {
    'sf_dir': sf,
    'oracle_budget_s': budget,
    'total': len(names),
    'ok': ok,
    'oracle_timeouts': sorted(n for n, s in res.items() if s == 'ORACLE_TIMEOUT'),
    'failures': {n: s for n, s in sorted(res.items()) if s.startswith('FAIL')},
    'queries': {n: ('OK' if s == 'OK' else s.split(':')[0]) for n, s in sorted(res.items())},
}
with open(artifact, 'w') as f:
    json.dump(doc, f, indent=1, sort_keys=True)
print(f"{ok}/{len(names)} OK -> {artifact}")
sys.exit(0 if ok == len(names) else 1)
