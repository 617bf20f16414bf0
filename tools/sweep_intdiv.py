#!/usr/bin/env python3
"""One-shot r8 sweep: rewrite DuckDB infix `//` in oracle SQL strings to
the function form divide(a, b) (identical semantics: truncating integer
division, exact on BIGINT/HUGEINT — verified v1.0.0; `floor(a/b)` would
be INEXACT past 2^53, see docs/driver-gate.md).

Operates on Scala source text: only margin (`|`) lines are touched,
`://` (URL schemes in regex literals) is skipped, and the rewrite
inserts `divide(`, `,`, `)` around the two operands without disturbing
anything between them, so multi-line expressions keep their margins.
Operand extraction follows SQL precedence: * / % // bind equally and
left-associate, so the left operand absorbs same-precedence chains and
stops at +,-, comparisons, commas, keywords, or an unbalanced '(' at
depth 0; the right operand is a single primary (number, possibly
qualified identifier with optional call parens, or parenthesized
expression, each with optional ::TYPE suffix).

Validation evidence: the committed sf0.1 correctness artifact
(CORRECTNESS_SF01_LOCAL.json) was regenerated after the sweep with all
three checkers green — every rewritten oracle reproduces its pre-sweep
frame exactly under the driver-hash compare.
"""
import re
import sys

FILES = [
    "src/main/scala/graft/multimodal/Multimodal.scala",
    "src/main/scala/graft/operators/Analytics.scala",
    "src/main/scala/graft/operators/Analytics2.scala",
    "src/main/scala/graft/operators/Analytics3.scala",
    "src/main/scala/graft/operators/Retrieval.scala",
    "src/main/scala/graft/operators/TextDedup.scala",
]

MARGIN = re.compile(r"\n[ \t]*\|")  # continuation margin = whitespace
KEYWORDS_STOP = {
    "SELECT", "FROM", "WHERE", "WHEN", "THEN", "ELSE", "END", "AND",
    "OR", "NOT", "AS", "ON", "BY", "IN", "CASE", "HAVING", "RETURN",
    "OVER", "BETWEEN", "LEAST", "GREATEST",  # LEAST/GREATEST only as bare words (never: they'd have parens)
}


def is_margin_ws(s, i):
    """True if s[i] starts a newline-margin run; returns end index."""
    m = MARGIN.match(s, i)
    return m.end() if m else None


def skip_ws_left(s, i):
    """Move i left past whitespace and margin runs; return new i
    (index AFTER the last non-ws char)."""
    while i > 0:
        c = s[i - 1]
        if c in " \t":
            i -= 1
        elif c == "|":
            # margin '|' only if preceded by newline+spaces
            j = i - 1
            while j > 0 and s[j - 1] in " \t":
                j -= 1
            if j > 0 and s[j - 1] == "\n":
                i = j - 1
            else:
                break
        elif c == "\n":
            i -= 1
        else:
            break
    return i


def skip_ws_right(s, i):
    while i < len(s):
        c = s[i]
        if c in " \t\n":
            i += 1
        elif c == "|":
            j = i - 1
            while j >= 0 and s[j] in " \t":
                j -= 1
            if j >= 0 and s[j] == "\n":
                i += 1
            else:
                break
        else:
            break
    return i


WORD = re.compile(r"[A-Za-z_][A-Za-z_0-9]*")
NUM = re.compile(r"[0-9]+(\.[0-9]+)?")


def left_operand_start(s, op_i):
    """Index where the left operand of the // at op_i begins."""
    i = skip_ws_left(s, op_i)
    start = i
    while True:
        i = skip_ws_left(s, start)
        if i == 0:
            break
        c = s[i - 1]
        if c == ")":
            # balanced group (incl. function args); then maybe a
            # function name / CAST before it
            depth = 0
            j = i
            while j > 0:
                j -= 1
                if s[j] == ")":
                    depth += 1
                elif s[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
            # preceding identifier => function call
            k = skip_ws_left(s, j)
            m = None
            for mm in WORD.finditer(s, max(0, k - 64), k):
                if mm.end() == k:
                    m = mm
            if m and m.group(0).upper() not in {
                    "WHEN", "THEN", "ELSE", "AND", "OR", "SELECT", "ON",
                    "WHERE", "BY", "IN", "OVER"}:
                start = m.start()
            else:
                start = j
            continue_chain = True
        elif c in "*%":
            start = i - 1
            continue_chain = True
        elif c == "/" and i >= 2 and s[i - 2] == "/":
            start = i - 2
            continue_chain = True
        elif c == "/":
            start = i - 1
            continue_chain = True
        elif WORD.match(c) or c.isdigit() or c in "._:'":
            # identifier / qualified name / number / ::TYPE / 'str'
            j = i
            while j > 0 and (s[j - 1].isalnum() or s[j - 1] in "._:'$"):
                j -= 1
            start = j
            continue_chain = True
        else:
            break
        if continue_chain:
            prev = skip_ws_left(s, start)
            if prev == 0:
                break
            pc = s[prev - 1]
            # chain continues only through same-precedence operators
            if pc in "*%":
                start = prev - 1
            elif pc == "/":
                start = prev - 2 if prev >= 2 and s[prev - 2] == "/" else prev - 1
            else:
                break
    return start


def right_operand_end(s, op_end):
    """Index just past the right operand of the // ending at op_end."""
    i = skip_ws_right(s, op_end)
    if i < len(s) and s[i] == "(":
        depth = 0
        while i < len(s):
            if s[i] == "(":
                depth += 1
            elif s[i] == ")":
                depth -= 1
                if depth == 0:
                    i += 1
                    break
            i += 1
    else:
        m = WORD.match(s, i)
        if m:
            i = m.end()
            # qualified name a.b / function call
            while i < len(s) and s[i] == ".":
                m2 = WORD.match(s, i + 1)
                if not m2:
                    break
                i = m2.end()
            j = skip_ws_right(s, i)
            if j < len(s) and s[j] == "(":
                depth = 0
                i = j
                while i < len(s):
                    if s[i] == "(":
                        depth += 1
                    elif s[i] == ")":
                        depth -= 1
                        if depth == 0:
                            i += 1
                            break
                    i += 1
        else:
            m = NUM.match(s, i)
            if m:
                i = m.end()
    # optional OVER (...) window suffix — sum(n) OVER (PARTITION BY x)
    # is one primary; divide(a, sum(n)) OVER (...) would not parse
    j = skip_ws_right(s, i)
    if s[j:j + 4].upper() == "OVER":
        k = skip_ws_right(s, j + 4)
        if k < len(s) and s[k] == "(":
            depth = 0
            while k < len(s):
                if s[k] == "(":
                    depth += 1
                elif s[k] == ")":
                    depth -= 1
                    if depth == 0:
                        k += 1
                        break
                k += 1
            i = k
    # optional ::TYPE suffix
    if i + 1 < len(s) and s[i:i + 2] == "::":
        m = WORD.match(s, i + 2)
        if m:
            i = m.end()
    return i


def margin_div_sites(text):
    """Offsets of `//` that are SQL integer division on margin lines."""
    sites = []
    for m in re.finditer(r"//", text):
        i = m.start()
        if i > 0 and text[i - 1] == ":":
            continue  # ://
        ls = text.rfind("\n", 0, i) + 1
        prefix = text[ls:i]
        if not re.match(r"^[ \t]*\|", prefix):
            continue  # not a margin (SQL) line => scala comment etc.
        sites.append(i)
    return sites


def rewrite(text):
    n = 0
    while True:
        sites = margin_div_sites(text)
        if not sites:
            return text, n
        i = sites[-1]  # rightmost first: nested a//b//c resolves inward
        ls = left_operand_start(text, i)
        re_ = right_operand_end(text, i + 2)
        left = text[ls:i].rstrip()
        right = text[i + 2:re_].lstrip()
        if not left or not right:
            raise SystemExit(
                f"operand extraction failed near: {text[max(0,i-80):i+80]!r}")
        text = text[:ls] + "divide(" + text[ls:i].rstrip() + ", " + \
            text[i + 2:re_].lstrip() + ")" + text[re_:]
        n += 1


total = 0
for f in FILES:
    with open(f) as fh:
        src = fh.read()
    out, n = rewrite(src)
    if n:
        with open(f, "w") as fh:
            fh.write(out)
    print(f"{f}: {n} rewrites")
    total += n
print(f"total: {total}")
