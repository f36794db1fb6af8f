#!/usr/bin/env python3
"""Generate a NON-ASCII variant of the documents table for the unicode
oracle-parity gate (tools/unicode_gate.sh).

The driver's synthetic corpus is pure ASCII (max code point 121), so the
standing DuckDB hash gate never exercises multi-byte UTF-8, surrogate
pairs, combining marks, special-casing (ss/I-dot), RTL scripts, or
astral-plane code points through the text/dedup/curation operators.
This script builds /tmp/unicode_sf/: every table symlinked from
sf0.001 except documents.parquet, which is regenerated with the same
schema (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR,
n_chars BIGINT) over a deliberately hostile multi-script vocabulary.

Generation is PURE ARITHMETIC (multiplicative hashing on the doc/word
index), no RNG library — byte-identical output on every run and every
Python version, so the gate is reproducible like the driver's seed=42
testdata.

Planted structure (so the dedup/span operators produce non-empty,
comparable output):
- near-dup pairs: docs i and i+N/2 share a word stream with a 2-word
  edit (exercises minhash/simhash/jaccard/containment over unicode
  shingles);
- a 100+-char unicode boilerplate span inserted into every 11th doc at
  content-dependent offsets (exercises the content-defined substring
  anchors over multi-byte text);
- repeated-char runs (ASCII '=' and ideographic space) that stress the
  anchor-modulus skew class ADVICE flagged;
- singleton emoji/ZWJ-sequence/combining-mark words so the code-point
  kernels (CharMoments, ascii(), split('')) see astral and composed
  forms.
"""
import os
import sys
import duckdb

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/unicode_sf"
SRC = "/root/testdata/sf0.001"
N_DOCS = 500

# Multi-script vocabulary. ASCII stopwords stay in so stopword/langid
# metrics keep meaning; the rest sweeps Latin-1 accents, special-casing
# hazards (ss, I-dot), Greek, Cyrillic, CJK, Hangul, Arabic+Hebrew
# (RTL), fullwidth forms, combining sequences, math-alphanumeric
# astral letters, and emoji (plain, VS16, ZWJ family sequence).
WORDS = [
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with",
    "data", "spark", "query", "merge", "table",
    "café", "naïve", "übergröße", "straße",
    "İstanbul", "ığdır", "fiançée",
    "ανάλυση", "δεδομένα",
    "данные", "запрос",
    "数据", "分析", "引擎", "東京",
    "데이터", "분석",
    "بيانات", "נתונים",
    "ＤＡＴＡ",  # fullwidth DATA
    "élève",  # decomposed combining accents
    "\U0001d54a\U0001d55d\U0001d552\U0001d55b\U0001d556",  # astral math letters
    "\U0001f680", "\U0001f600", "✨️",  # emoji + VS16
    "\U0001f468‍\U0001f469‍\U0001f467",  # ZWJ family sequence
    "çok", "खोज", "ขॉมูล",
]

BOILERPLATE = (
    "© 2026 数据引擎 Inc — all rights "
    "réservés · данные "
    "נתונים \U0001f680 terms apply to "
    "every straße café shard"
)
RUN_EQ = "=" * 40
RUN_IDEO = "　" * 24  # ideographic-space run

LANGS = ["en", "es", "zh", "de", "fr", "ru", "ar", "ko"]
SOURCES = ["src0", "src1", "src2", "src3", "src4"]


def h(x: int) -> int:
    """Deterministic 63-bit multiplicative mix."""
    x = (x * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
    x ^= x >> 29
    return (x * 0xBF58476D1CE4E5B9) & 0x7FFFFFFFFFFFFFFF


def doc_words(i: int):
    """Word stream for doc i; docs i and i+N/2 share it modulo a
    2-word edit, so near-dup pairs cross the corpus."""
    base = i % (N_DOCS // 2)
    n = 20 + h(base * 7 + 1) % 70
    ws = [WORDS[h(base * 131 + j) % len(WORDS)] for j in range(n)]
    if i >= N_DOCS // 2:  # the edited twin
        ws[h(base) % n] = "edited"
        ws[(h(base) + 7) % n] = "twin"
    return ws


def build_text(i: int) -> str:
    ws = doc_words(i)
    if i % 11 == 3:  # boilerplate span at a content-dependent offset
        ws.insert(h(i * 3) % len(ws), BOILERPLATE)
    if i % 29 == 5:
        ws.insert(0, RUN_EQ)
    if i % 37 == 8:
        ws += [RUN_IDEO, RUN_IDEO]  # two unicode-whitespace runs
    return " ".join(ws)


# Degenerate documents appended after the main corpus: the Spark
# operators guard these shapes (ANSI division, empty payloads, missing
# terminators/vowels) and EdgeCaseSpec pins the engine side — but the
# ORACLE twins only prove parity if the gate corpus actually contains
# them. doc_ids continue after N_DOCS.
DEGENERATES = [
    "",                       # empty text (payload-empty mm path)
    " ",                      # single ASCII space (trims to empty)
    "   \t  ",                # ASCII whitespace only
    "　　",                   # unicode whitespace only (NOT trimmed)
    "x",                      # single char
    "\U0001f680",             # single astral char
    "bcdfg hjklm npqrs",      # no vowels (readability's syllable=0)
    "no sentence terminator here at all",
    "!!! ??? ...",            # punctuation only
    "1234567890 42 7",        # digits only
]


def main():
    os.makedirs(OUT, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    rows = []
    for i in range(N_DOCS):
        text = build_text(i)
        rows.append((i, text, LANGS[h(i + 13) % len(LANGS)],
                     SOURCES[h(i + 57) % len(SOURCES)], len(text)))
    for j, text in enumerate(DEGENERATES):
        i = N_DOCS + j
        rows.append((i, text, LANGS[h(i + 13) % len(LANGS)],
                     SOURCES[h(i + 57) % len(SOURCES)], len(text)))
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    # n_chars = Python len(text) = code points, the driver's convention
    # (identical to DuckDB length() and Spark length())
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
    n, cp = con.execute(
        "SELECT count(*), max(length(text)) FROM d").fetchone()
    print(f"wrote {OUT}/documents.parquet: {n} docs, max len {cp}")


if __name__ == "__main__":
    main()
