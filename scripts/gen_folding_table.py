"""Regenerate rusticsearch_spark/analysis/lucene_folding.py.

Mechanically transcribes the char match arms of the reference's
Apache-2.0 Lucene ASCIIFoldingFilter port
(/root/reference/src/analysis/lucene_asciifold.rs:23-2345) into a
flat {codepoint: replacement} Python dict.  Data-only extraction —
the runtime fold is a str.translate over this table, not the
reference's match statement.

Usage: python scripts/gen_folding_table.py [path-to-lucene_asciifold.rs]
"""
import json
import re
import sys

SRC = sys.argv[1] if len(sys.argv) > 1 else \
    "/root/reference/src/analysis/lucene_asciifold.rs"
OUT = "rusticsearch_spark/analysis/lucene_folding.py"

cp_re = re.compile(r"'\\u\{([0-9A-Fa-f]+)\}'")
push_re = re.compile(
    r"push(?:_str)?\(\s*(?:'((?:\\.|[^'\\])+)'|\"((?:\\.|[^\"\\])*)\")\s*\)")


def unesc(s: str) -> str:
    return s.replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")


def parse(path: str) -> dict:
    body = open(path).read().split("match c {", 1)[1]
    body = body.split("#[cfg(test)]")[0]
    table, pending, target, in_body = {}, [], [], False
    for ln in body.splitlines():
        code = ln.split("//")[0]
        if not in_body:
            for cp in cp_re.findall(code):
                pending.append(chr(int(cp, 16)))
            if "=>" in code:
                in_body, target = True, []
        if in_body:
            for a, b in push_re.findall(code):
                target.append(unesc(a or b))
            if code.strip() == "}":       # arm body closes
                t = "".join(target)
                for ch in pending:
                    assert table.get(ch, t) == t, (hex(ord(ch)), t)
                    table[ch] = t
                pending, target, in_body = [], [], False
    return table


def emit(table: dict, out: str) -> None:
    lines = [
        '"""Lucene ASCIIFoldingFilter character table (generated data).',
        "",
        "Transcribed mechanically from the reference's Rust port of Apache",
        "Lucene's ASCIIFoldingFilter",
        "(/root/reference/src/analysis/lucene_asciifold.rs:23-2345, itself an",
        "Apache-2.0-licensed transcription of",
        "org.apache.lucene.analysis.ASCIIFoldingFilter).  One entry per",
        "mapped codepoint; characters absent from the table are left",
        "untouched (non-Latin scripts pass through).  Regenerate with",
        "scripts/gen_folding_table.py.",
        '"""',
        "",
        "FOLD_TABLE = {",
    ]
    for ch in sorted(table, key=ord):
        k = ('"\\u{:04X}"'.format(ord(ch)) if ord(ch) > 0x7F
             else json.dumps(ch))
        lines.append("    %s: %s," % (k, json.dumps(table[ch],
                                                    ensure_ascii=False)))
    lines += ["}", ""]
    open(out, "w").write("\n".join(lines))


if __name__ == "__main__":
    t = parse(SRC)
    emit(t, OUT)
    print("wrote %d entries to %s" % (len(t), OUT))
