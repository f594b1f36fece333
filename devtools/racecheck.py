#!/usr/bin/env python3
"""Two-process warehouse race harness (r9, VERDICT #9).

Spawns two JVMs racing the SAME cold warehouse key (graft.RaceProbe
holds its build open ~2 s so both are in-flight), then asserts the
cross-process completion protocol: both processes land on one completed
artifact, exactly one of them actually built (the loser adopted the
winner via the rename-collision path), and no tmp litter survives.

Usage: racecheck.py [classes_dir]   (default target/scala-2.13/classes)
Exit 0 = pass. Run from the repo root as part of the verify recipe.
"""
import os
import re
import subprocess
import sys
import tempfile


def run_round(classes: str) -> int:
    """One race attempt. Returns 0 = raced and passed, 2 = no overlap
    (startup skew — retry), 1 = protocol violation."""
    root = tempfile.mkdtemp(prefix='graft-race-wh-')
    ds = tempfile.mkdtemp(prefix='graft-race-ds-')
    # the key hashes the source file's version: any readable file works
    with open(os.path.join(ds, 'documents.parquet'), 'wb') as f:
        f.write(b'race fixture')
    env = dict(os.environ, GRAFT_WAREHOUSE=root)
    cmd = ['java', '-cp', classes, 'graft.RaceProbe', ds]
    procs = [subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE, text=True)
             for _ in range(2)]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    if any(rc != 0 for rc in rcs):
        print(f'FAIL: exit codes {rcs}\n' + '\n'.join(outs))
        return 1
    results = [re.search(
        r'RACE_RESULT pid=(\d+) dir=(\S+) built=(\d+) start=(\d+) end=(\d+)', o)
        for o in outs]
    if any(r is None for r in results):
        print('FAIL: unparseable probe output\n' + '\n'.join(outs))
        return 1
    # the harness is only honest when both builds were IN FLIGHT at
    # once — a late starter takes the manifest fast-path (built=0,
    # start=end=0) or builds after the winner completed; either way the
    # adoption path never ran and the round must retry, not pass
    windows = [(int(r.group(4)), int(r.group(5))) for r in results]
    if any(s == 0 for s, _ in windows) or \
            not (windows[0][0] < windows[1][1] and windows[1][0] < windows[0][1]):
        print(f'no overlap (startup skew): windows={windows}, retrying')
        return 2
    dirs = {r.group(2) for r in results}
    built = sum(int(r.group(3)) for r in results)
    entries = os.listdir(root)
    artifact = [e for e in entries if e.startswith('race2p@')]
    tmp_litter = [e for e in entries if '.tmp-' in e]
    ok = True
    if len(dirs) != 1:
        print(f'FAIL: processes diverged: {dirs}'); ok = False
    if built != 1:
        # with overlap proven, exactly one move wins; built=2 means the
        # loser's adoption path failed to detect the collision
        print(f'FAIL: expected exactly one builder, got {built}'); ok = False
    if len(artifact) != 1:
        print(f'FAIL: expected one completed artifact, got {artifact}'); ok = False
    if tmp_litter:
        print(f'FAIL: tmp litter survived: {tmp_litter}'); ok = False
    d = dirs.pop()
    for f in ('_MANIFEST.json', 'data.bin'):
        if not os.path.exists(os.path.join(d, f)):
            print(f'FAIL: artifact incomplete, missing {f}'); ok = False
    if ok:
        print('racecheck OK: overlapping builds, one artifact, '
              'one builder of two pids, no litter')
    return 0 if ok else 1


def main() -> int:
    classes = sys.argv[1] if len(sys.argv) > 1 \
        else 'target/scala-2.13/classes:/opt/spark/jars/*'
    for _ in range(3):
        rc = run_round(classes)
        if rc != 2:
            return rc
    print('FAIL: no overlapping race in 3 attempts')
    return 1


if __name__ == '__main__':
    sys.exit(main())
