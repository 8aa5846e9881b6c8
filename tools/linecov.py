"""Stdlib-only line coverage for xcontour_tpu (no pip in this image).

Uses sys.monitoring (PEP 669, Python 3.12+) LINE events restricted to files
under the package directory, so the overhead stays small on a suite whose
time is dominated by numpy/jax C code.

Run the test suite under it:

    python tools/linecov.py -m pytest tests/ -q -m "not slow"

then report:

    python tools/linecov.py --report           # per-file summary
    python tools/linecov.py --report --missing # plus uncovered line ranges

Data accumulates in .linecov.json (delete it to reset), so slow-marked and
quick runs can be merged across invocations.
"""

from __future__ import annotations

import json
import os
import runpy
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "xcontour_tpu")
DATA = os.path.join(ROOT, ".linecov.json")

TOOL = 2  # sys.monitoring tool id (coverage)


def _executable_lines(path):
    """Line numbers that carry code objects (compile-based, like coverage.py's
    arc-less mode): every line that appears in any code object's co_lines."""
    with open(path) as f:
        src = f.read()
    lines = set()
    todo = [compile(src, path, "exec")]
    while todo:
        code = todo.pop()
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                todo.append(const)
        for _, _, ln in code.co_lines():
            if ln is not None:
                lines.add(ln)
    # docstrings/module headers count as executable via co_lines; acceptable
    return lines


def run(argv):
    # `python -m pytest` from the repo root would put the root on sys.path;
    # running under this wrapper puts tools/ there instead — restore it
    if ROOT not in sys.path:
        sys.path.insert(0, ROOT)
    hits: dict[str, set[int]] = {}
    mon = sys.monitoring
    mon.use_tool_id(TOOL, "linecov")

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            s = hits.get(fn)
            if s is None:
                s = hits[fn] = set()
            s.add(line)
        # coverage is set-membership, not counts: disabling each location
        # after its first hit makes the steady-state overhead near zero
        return mon.DISABLE

    mon.register_callback(TOOL, mon.events.LINE, on_line)
    mon.set_events(TOOL, mon.events.LINE)
    try:
        if argv[0] == "-m":
            mod = argv[1]
            sys.argv = [mod] + argv[2:]
            try:
                runpy.run_module(mod, run_name="__main__", alter_sys=True)
            except SystemExit as e:
                print(f"[linecov] exit {e.code}")
        else:
            sys.argv = argv
            runpy.run_path(argv[0], run_name="__main__")
    finally:
        mon.set_events(TOOL, 0)
        old = {}
        if os.path.exists(DATA):
            with open(DATA) as f:
                old = json.load(f)
        for fn, s in hits.items():
            rel = os.path.relpath(fn, ROOT)
            s |= set(old.get(rel, []))
            old[rel] = sorted(s)
        with open(DATA, "w") as f:
            json.dump(old, f)
        print(f"[linecov] wrote {DATA} ({len(hits)} package files touched)")


def _ranges(sorted_lines):
    out, start, prev = [], None, None
    for ln in sorted_lines:
        if start is None:
            start = prev = ln
        elif ln == prev + 1:
            prev = ln
        else:
            out.append((start, prev))
            start = prev = ln
    if start is not None:
        out.append((start, prev))
    return out


def report(show_missing=False):
    with open(DATA) as f:
        data = json.load(f)
    rows = []
    for rel in sorted(data):
        path = os.path.join(ROOT, rel)
        if not os.path.exists(path):
            continue
        exe = _executable_lines(path)
        hit = set(data[rel]) & exe
        missing = sorted(exe - hit)
        rows.append((rel, len(hit), len(exe), missing))
    tot_h = sum(r[1] for r in rows)
    tot_e = sum(r[2] for r in rows)
    for rel, h, e, missing in rows:
        pct = 100.0 * h / e if e else 100.0
        print(f"{pct:6.1f}%  {h:5d}/{e:<5d}  {rel}")
        if show_missing and missing:
            spans = ", ".join(f"{a}" if a == b else f"{a}-{b}"
                              for a, b in _ranges(missing))
            print(f"         missing: {spans}")
    if tot_e:
        print(f"{100.0 * tot_h / tot_e:6.1f}%  {tot_h:5d}/{tot_e:<5d}  TOTAL")


if __name__ == "__main__":
    args = sys.argv[1:]
    if not args or args[0] == "--report":
        report(show_missing="--missing" in args)
    else:
        run(args)
