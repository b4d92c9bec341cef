"""CLI golden diffs against the reference's own distribution outputs
(round-2 verdict item #4): replay test/cli/test27 and test83 — every
`$EXE +units=us-ft +init=nad27:ZONE -E -f '%.3f'` heredoc — through
`python -m proj_spark proj` and compare line-by-line against
pj_out27.dist / pj_out83.dist.

Comparison mirrors the reference's `diff -b` (whitespace-run
insensitive).  The computed coordinate fields must match the golden
byte-for-byte after whitespace normalization; a +-1 final-digit slack
(0.001 us-ft ~ 0.3 mm) is tolerated on at most a small tail of lines —
the reference itself documents "Proj will vary in the .001ft range"
across libms (test/cli/test27 header comment).
"""

from __future__ import annotations

import io
import re
import sys

import pytest

REF_CLI = "/root/reference/test/cli"

_CALL = re.compile(r"^\$EXE\s+(.*?)\s*>>?\$\{OUT\}\s*<<EOF\s*$")


def _parse_script(path: str):
    """Yield (args, input_lines) for every $EXE heredoc in the script."""
    calls = []
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        m = _CALL.match(lines[i].strip())
        if m:
            args = m.group(1).replace("${INIT_FILE}", "nad27_or_83")
            body = []
            i += 1
            while i < len(lines) and lines[i].strip() != "EOF":
                body.append(lines[i])
                i += 1
            calls.append((args, body))
        i += 1
    return calls


def _run_golden(script: str, dist: str, init_name: str,
                exact_floor: float = 0.95):
    from proj_spark.__main__ import main
    calls = _parse_script(f"{REF_CLI}/{script}")
    assert len(calls) > 100, f"heredoc parse found only {len(calls)} calls"
    out = []
    for args, body in calls:
        argv = []
        for tok in args.split():
            tok = tok.strip("'\"")
            argv.append(tok.replace("nad27_or_83", init_name))
        old_stdin, old_stdout = sys.stdin, sys.stdout
        sys.stdin = io.StringIO("\n".join(body) + "\n")
        sys.stdout = io.StringIO()
        try:
            rc = main(["proj"] + argv)
            captured = sys.stdout.getvalue()
        finally:
            sys.stdin, sys.stdout = old_stdin, old_stdout
        assert rc == 0, (args, captured)
        out += [ln for ln in captured.splitlines() if ln]
    with open(f"{REF_CLI}/{dist}") as f:
        want = [ln for ln in f.read().splitlines() if ln.strip()]
    assert len(out) == len(want), (len(out), len(want))

    def norm(s: str) -> list[str]:
        return s.split()

    exact = 0
    off_by_ulp = 0
    bad = []
    for got, exp in zip(out, want):
        g, w = norm(got), norm(exp)
        if g == w:
            exact += 1
            continue
        # tolerate +-0.001 (one printf digit) on numeric fields only
        if len(g) == len(w):
            ok = True
            for a, b in zip(g, w):
                if a == b:
                    continue
                try:
                    if abs(float(a) - float(b)) <= 0.0011:
                        continue
                except ValueError:
                    pass
                ok = False
                break
            if ok:
                off_by_ulp += 1
                continue
        bad.append((got, exp))
    assert not bad, f"{len(bad)} mismatched lines, first: {bad[:3]}"
    assert exact / len(want) >= exact_floor, (exact, off_by_ulp, len(want))
    return exact, off_by_ulp, len(want)


def test_pj_out27_golden():
    exact, near, total = _run_golden("test27", "pj_out27.dist", "nad27")
    print(f"test27: {exact}/{total} byte-exact, {near} within 0.001")


def test_pj_out83_golden():
    """Byte-exact once the proj app matches the reference's legacy
    pj_init path (no cs2cs emulation: the GRS80 null-towgs84 cart hop
    must NOT be applied by proj — it shifted the final printf digit on
    ~1/3 of lines before the fix)."""
    exact, near, total = _run_golden("test83", "pj_out83.dist", "nad83",
                                     exact_floor=1.0)
    print(f"test83: {exact}/{total} byte-exact, {near} within 0.001")


# ---------------------------------------------------------------------------
# testvarious -> tv_out.dist (cs2cs golden corpus)
# ---------------------------------------------------------------------------

_TV_CALL = re.compile(r"^\$EXE\s+(.*?)\s*>>?\s*\$\{?OUT\}?\s*(?:2>&1)?\s*<<EOF$")
_TV_ECHO = re.compile(r'^echo\s+"?(.*?)"?\s*>>\s*\$\{?OUT\}?$')


def _tv_segments(path: str):
    """Script -> [{title, runs}] segments delimited by ###### banners
    (heredocs collected with backslash continuations joined)."""
    joined, buf = [], ""
    for ln in open(path).read().splitlines():
        if ln.rstrip().endswith("\\"):
            buf += ln.rstrip()[:-1] + " "
            continue
        joined.append(buf + ln)
        buf = ""
    events, i = [], 0
    while i < len(joined):
        ln = joined[i].strip()
        m = _TV_ECHO.match(ln)
        if m:
            events.append(("banner", m.group(1)))
        else:
            m = _TV_CALL.match(ln)
            if m:
                body = []
                i += 1
                while i < len(joined) and joined[i].strip() != "EOF":
                    body.append(joined[i])
                    i += 1
                events.append(("run", m.group(1), body))
        i += 1
    segs, cur = [], None
    for e in events:
        if e[0] == "banner" and set(e[1]) == {"#"}:
            if cur:
                segs.append(cur)
            cur = {"title": None, "runs": []}
        elif e[0] == "banner":
            if cur and cur["title"] is None:
                cur["title"] = e[1]
            elif cur:
                cur["runs"].append(("echo", e[1]))
        elif cur is not None:
            cur["runs"].append(e)
    if cur:
        segs.append(cur)
    return segs


def _dist_segments(path: str):
    segs, d = [], None
    for ln in open(path).read().splitlines():
        if set(ln.strip()) == {"#"} and ln.strip():
            if d is not None:
                segs.append(d)
            d = []
        elif d is not None:
            d.append(ln)
    if d is not None:
        segs.append(d)
    return segs


def _run_cli(argv, stdin):
    from proj_spark.__main__ import main
    si, so = sys.stdin, sys.stdout
    sys.stdin = io.StringIO(stdin)
    sys.stdout = io.StringIO()
    try:
        main(argv)
        return sys.stdout.getvalue()
    finally:
        sys.stdin, sys.stdout = si, so


def test_tv_out_golden():
    """Replay every cs2cs heredoc of test/cli/testvarious and compare
    per-segment against tv_out.dist (diff -b semantics).  66/67
    segments byte-exact; the single remaining segment (MGI, #207) is
    numerically within 5 mm — the same final-printf-digit variance as
    test83 (the engine's exact-Clenshaw TM vs the reference's Snyder
    series), asserted as a tolerance segment."""
    import shlex

    segs = _tv_segments(f"{REF_CLI}/testvarious")
    dsegs = _dist_segments(f"{REF_CLI}/tv_out.dist")
    assert len(segs) == len(dsegs) == 67
    exact = 0
    near = []
    for seg, dseg in zip(segs, dsegs):
        out_lines = [seg["title"]] if seg["title"] else []
        for r in seg["runs"]:
            if r[0] == "echo":
                out_lines.append(r[1])
                continue
            out = _run_cli(["cs2cs"] + shlex.split(r[1]),
                           "\n".join(r[2]) + "\n")
            out_lines += out.splitlines()
        got = [ln.split() for ln in out_lines]
        want = [ln.split() for ln in dseg]
        if got == want:
            exact += 1
            continue
        # numeric-tolerance fallback: every differing token must be a
        # number within 5 mm / 5e-8 deg of the golden
        assert len(got) == len(want), (seg["title"], out_lines, dseg)
        for g, w in zip(got, want):
            assert len(g) == len(w), (seg["title"], g, w)
            for a, b in zip(g, w):
                if a == b:
                    continue
                assert abs(float(a) - float(b)) <= 5e-3, (seg["title"], a, b)
        near.append(seg["title"])
    assert exact >= 66, (exact, near)
    assert near == ["Test MGI datum gives expected results (#207)"], near


def test_cct_golden():
    """testcct -> testcct_out.dist: byte-identical (modulo the banner
    echo line, produced by the shell script, asserted verbatim)."""
    out = _run_cli(["cct", "-d", "8", "+proj=merc", "+R=1"], "90 45 0\n")
    want = open(f"{REF_CLI}/testcct_out.dist").read().splitlines()
    assert out.splitlines() == [want[1]]
    assert want[0] == "Testing cct -d 8 +proj=merc +R=1"
