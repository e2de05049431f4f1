"""Merge a focused bench_edit re-measurement into BENCH_EDIT_r05.json.

The committed r5 sweep measured alternative buckets b8/b16 only (b16 at
the 16-LR window landed at 5.02 ms/alternative — a hair over the <5
target).  The focused rerun (BENCH_EDIT_WINDOWS=16
BENCH_EDIT_ALT_BUCKETS=8,16,32,64) extends the amortization curve; this
script appends that record (tagged ``focused_rerun``) rather than
editing the original rows, so both captures stay auditable.
"""
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(src='/tmp/bench_edit_b32.json'):
    path = os.path.join(ROOT, 'BENCH_EDIT_r05.json')
    with open(path) as f:
        doc = json.load(f)
    with open(src) as f:
        new = json.load(f)
    recs = new['records'] if isinstance(new, dict) else new
    doc['records'] = [r for r in doc['records']
                      if not r.get('focused_rerun')]
    for r in recs:
        r['focused_rerun'] = ('alt buckets extended to b32/b64; '
                              'same methodology, min-of-3')
        doc['records'].append(r)
    with open(path, 'w') as f:
        json.dump(doc, f, indent=1)
    print('merged', len(recs), 'focused records into', path)


if __name__ == '__main__':
    main()
