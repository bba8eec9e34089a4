#!/usr/bin/env python3
"""Parse a jax.profiler xplane.pb WITHOUT tensorboard: per-op durations.

Usage:
    import jax; jax.profiler.start_trace("/tmp/jaxtrace")
    ... run the query ...
    jax.profiler.stop_trace()
    python tools/profiling/parse_xplane.py /tmp/jaxtrace/**/*.xplane.pb

Round-1 finding (see PERF.md): on the virtualized TPU runtime the
compiled-program timeline is dominated by copy-start/copy-done pairs
staging buffers through host memory space S(1), ~0.4-0.5 s latency each
regardless of size. This parser surfaces exactly that: XPlane protos are
walked generically (XSpace.planes→XPlane{name=2, lines=3,
event_metadata=4}; XLine.events=4; XEvent{metadata_id=1, duration_ps=3}).
"""

import collections
import glob
import sys


def varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def fields(buf):
    i = 0
    while i < len(buf):
        try:
            tag, i = varint(buf, i)
        except Exception:  # noqa: BLE001
            return
        fn, wt = tag >> 3, tag & 7
        try:
            if wt == 0:
                v, i = varint(buf, i)
                yield fn, wt, v
            elif wt == 2:
                ln, i = varint(buf, i)
                if ln > len(buf) - i:
                    return
                yield fn, wt, buf[i:i + ln]
                i += ln
            elif wt == 5:
                yield fn, wt, buf[i:i + 4]
                i += 4
            elif wt == 1:
                yield fn, wt, buf[i:i + 8]
                i += 8
            else:
                return
        except Exception:  # noqa: BLE001
            return


def analyze(path, top=30):
    data = open(path, "rb").read()
    for fn, wt, plane in fields(data):
        if fn != 1 or wt != 2:
            continue
        name = next((v.decode(errors="replace") for f, w, v in fields(plane)
                     if f == 2 and w == 2), "")
        meta = {}
        for f, w, v in fields(plane):
            if f == 4 and w == 2:
                k, nm = None, ""
                for f2, w2, v2 in fields(v):
                    if f2 == 1 and w2 == 0:
                        k = v2
                    if f2 == 2 and w2 == 2:
                        for f3, w3, v3 in fields(v2):
                            if f3 == 2 and w3 == 2:
                                nm = v3.decode(errors="replace")
                if k is not None:
                    meta[k] = nm
        tot = collections.Counter()
        cnt = collections.Counter()
        for f, w, v in fields(plane):
            if f != 3 or w != 2:
                continue
            for f2, w2, v2 in fields(v):
                if f2 == 4 and w2 == 2:
                    mid = dur = None
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        if f3 == 3 and w3 == 0:
                            dur = v3
                    if mid is not None and dur is not None:
                        nm = meta.get(mid, str(mid))
                        tot[nm] += dur
                        cnt[nm] += 1
        if tot:
            print(f"\n== plane {name} — top ops by total duration ==")
            for nm, ps in tot.most_common(top):
                print(f"{ps/1e9:10.2f} ms  x{cnt[nm]:<5d} {nm[:100]}")


if __name__ == "__main__":
    for pat in sys.argv[1:]:
        for p in glob.glob(pat, recursive=True):
            print(f"### {p}")
            analyze(p)
