#!/usr/bin/env python3
"""Append the just-finished sweep (BENCH_LAST.json) to BENCH_R17_RUNS.jsonl
and print a one-line summary (health tag, leg medians, A/B, flags)."""
import json, sys

art = json.load(open('BENCH_LAST.json'))
with open('BENCH_R17_RUNS.jsonl', 'a') as f:
    f.write(json.dumps(art) + '\n')
ab = art.get('wire_lc_ab') or {}
if isinstance(ab, dict):  # pre-alternation object form
    abtxt = ','.join(f"{k}={int(v['value'])}" for k, v in ab.items()) or 'cut'
else:  # alternating-order list form
    abtxt = ','.join(f"{e['mode']}={int(e['value'])}" for e in ab) or 'cut'
print(f"health={art.get('sweep_health')} total={art.get('value'):.1f}s "
      f"wire={art.get('ingest_wire_events_per_sec')}(fl={art.get('ingest_wire_flagged')}) "
      f"batch={art.get('ingest_events_per_sec')}(fl={art.get('ingest_batch_flagged')}) "
      f"stream={art.get('ingest_streaming_events_per_sec')}(fl={art.get('ingest_streaming_flagged')}) "
      f"insess={art.get('ingest_in_session')} ab[{abtxt}] "
      f"skipped={art.get('skipped_count')} elapsed={art.get('bench_elapsed_sec')}s")
canary = art.get('canary') or {}
if canary:
    rats = sorted(v['ratio'] for v in canary.values())
    print('canary ratios:', [round(r,2) for r in rats], 'median:', rats[len(rats)//2])
