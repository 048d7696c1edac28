#!/usr/bin/env python3
"""Convert the reference simplejsonmatch test table (Go composite literals,
/root/reference/internal/simplejsonmatch/match_test.go) into a JSONL corpus
consumed by JsonMatchCorpusSpec. Each output line:
  {"name": "case_12", "input": ..., "schema": ..., "expected": true}
$ref cases (TestMatchRefSkipped) are excluded — the operator is
unimplemented in the reference too.
"""
import json
import re
import sys

SRC = "/root/reference/internal/simplejsonmatch/match_test.go"
OUT = "src/test/resources/jsonmatch_corpus.jsonl"


def go_literal_to_json(s: str) -> str:
    """Tokenize a Go composite literal into JSON text."""
    s = s.strip()
    out = []
    stack = []
    i = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == '"':
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == '"':
                    break
                j += 1
            out.append(s[i : j + 1])
            i = j + 1
        elif s.startswith("map[string]any{", i):
            out.append("{")
            stack.append("}")
            i += len("map[string]any{")
        elif s.startswith("[]any{", i):
            out.append("[")
            stack.append("]")
            i += len("[]any{")
        elif s.startswith("float64(", i):
            j = s.index(")", i)
            out.append(s[i + len("float64(") : j])
            i = j + 1
        elif c == "}":
            out.append(stack.pop())
            i += 1
        elif s.startswith("nil", i) and (i + 3 == n or not s[i + 3].isalnum()):
            out.append("null")
            i += 3
        else:
            out.append(c)
            i += 1
    return "".join(out)


def split_entry(line: str):
    """Split `{input, schema, expected},` into its three top-level parts."""
    line = line.strip()
    assert line.startswith("{") and line.endswith("},"), line
    body = line[1:-2]
    parts = []
    depth = 0
    cur = []
    in_str = False
    i = 0
    while i < len(body):
        c = body[i]
        if in_str:
            cur.append(c)
            if c == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            cur.append(c)
        elif c in "{[(":
            depth += 1
            cur.append(c)
        elif c in "}])":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
        i += 1
    parts.append("".join(cur))
    assert len(parts) == 3, (line, parts)
    return parts


def extract_cases(text: str, func: str, prefix: str):
    body = text.split(f"func {func}(")[1].split("\n\t}\n")[0]
    cases = []
    idx = None
    for raw in body.splitlines():
        line = raw.strip()
        m = re.match(r"^// (\d+)$", line)
        if m:
            idx = m.group(1)
            continue
        m = re.match(r"^// original index: (\d+)$", line)
        if m:
            idx = m.group(1)
            continue
        if line.startswith("{") and line.endswith("},"):
            inp, schema, expected = split_entry(line)
            cases.append(
                {
                    "name": f"{prefix}{idx}",
                    "input": json.loads(go_literal_to_json(inp)),
                    "schema": json.loads(go_literal_to_json(schema)),
                    "expected": expected.strip() == "true",
                }
            )
            idx = None
    return cases


def main():
    text = open(SRC).read()
    main_cases = extract_cases(text, "TestMatch", "case_")
    not_cases = extract_cases(text, "TestMatchNot", "not_case_")
    assert len(main_cases) == 108, len(main_cases)
    assert len(not_cases) == 12, len(not_cases)
    with open(OUT, "w") as f:
        for c in main_cases + not_cases:
            f.write(json.dumps(c, sort_keys=False) + "\n")
    print(f"wrote {len(main_cases) + len(not_cases)} cases to {OUT}")


if __name__ == "__main__":
    main()
