"""WordPiece vocabulary induction + longest-match tokenization.

Completes the subword-tokenizer family (BPE `operators/bpe.py`,
unigram-LM `operators/unigram.py` — WordPiece is the third major
scheme, the BERT one): training merges like BPE but scores a pair by
``count(pair) / (count(a) * count(b))`` (Schuster & Nakajima 2012;
the likelihood-gain criterion public in the BERT paper and the
HuggingFace tokenizers docs), which prefers pairs whose parts rarely
appear apart — a discriminating behavior the tests pin. Inference is
BERT's greedy LONGEST-MATCH-FIRST against the final vocabulary with
``##`` continuation pieces and ``[UNK]`` fallback — not merge
replay, so tokenization needs only the vocab set.

Scale shape — identical industrial split to BPE:

- **counting is distributed**: one explode + combinable groupBy gives
  the word-frequency table (distinct-vocabulary-sized, deterministic
  top-``max_words`` cap).
- **merge induction is driver-side over that table**: pair argmax
  state is O(distinct words), corpus-size-independent.
- **tokenization is map-only**: the vocab set broadcasts into an
  Arrow-batch ``mapInPandas`` kernel with per-batch word memoization.
  No shuffle.

Reference scope note: the reference pipeline has no tokenizer; this
extends the §2 text-analysis family per the LLM-ops charter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import word_counts

UNK = "[UNK]"
_CONT = "##"


def _strip_cont(sym: str) -> str:
    return sym[len(_CONT):] if sym.startswith(_CONT) else sym


def _word_symbols(word: str) -> tuple:
    """BERT's within-word alphabet: first char plain, continuations
    ##-prefixed."""
    return tuple(
        c if i == 0 else _CONT + c for i, c in enumerate(word)
    )


def wordpiece_train(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = 100_000,
    lowercase: bool = True,
) -> dict:
    """Learn a WordPiece vocabulary from the corpus' word-frequency
    table. Each round merges the adjacent pair maximizing
    ``count(pair) / (count(left) * count(right))`` — exact integer
    cross-multiplied comparison (no float scores), ties broken
    lexicographically, so training is bit-stable for a fixed corpus.
    Returns a JSON-serializable ``{"vocab": [...], "lowercase": ...}``
    model whose vocab is the character alphabet plus every merged
    piece (continuation pieces carry the ``##`` prefix)."""
    rows = (
        word_counts(df, text_col, lowercase)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple, int] = {}
    for r in rows:
        syms = _word_symbols(r["word"])
        if syms:
            vocab[syms] = vocab.get(syms, 0) + r["n"]
    alphabet = sorted({s for syms in vocab for s in syms})
    pieces: list[str] = []
    for _ in range(int(num_merges)):
        pair_n: dict[tuple, int] = {}
        sym_n: dict[str, int] = {}
        for syms, n in vocab.items():
            for s in syms:
                sym_n[s] = sym_n.get(s, 0) + n
            for p in zip(syms, syms[1:]):
                pair_n[p] = pair_n.get(p, 0) + n
        repeating = {p: n for p, n in pair_n.items() if n >= 2}
        if not repeating:
            break
        # argmax of n_ab / (n_a * n_b) by exact cross-multiplication:
        # a/b > c/d  <=>  a*d > c*b  (all positive integers)
        best = None  # (pair, num, den)
        for p, n in repeating.items():
            den = sym_n[p[0]] * sym_n[p[1]]
            if (
                best is None
                or n * best[2] > best[1] * den
                or (n * best[2] == best[1] * den and p < best[0])
            ):
                best = (p, n, den)
        a, b = best[0]
        merged = a + _strip_cont(b)
        out: dict[tuple, int] = {}
        for syms, n in vocab.items():
            new, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    new.append(merged)
                    i += 2
                else:
                    new.append(syms[i])
                    i += 1
            key = tuple(new)
            out[key] = out.get(key, 0) + n
        vocab = out
        pieces.append(merged)
    return {
        "vocab": sorted(set(alphabet) | set(pieces)),
        "lowercase": bool(lowercase),
    }


def _encode_word(word: str, vocab: set[str]) -> list[str]:
    """BERT's greedy longest-match-first: take the longest vocab piece
    prefixing the remainder (##-prefixed after the first), [UNK] for
    the whole word if any position has no match."""
    out: list[str] = []
    i = 0
    while i < len(word):
        end = len(word)
        piece = None
        while end > i:
            cand = word[i:end] if i == 0 else _CONT + word[i:end]
            if cand in vocab:
                piece = cand
                break
            end -= 1
        if piece is None:
            return [UNK]
        out.append(piece)
        i = end
    return out


def wordpiece_tokenize(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Map-only tokenization: the vocab set rides into an Arrow-batch
    kernel with per-batch word memoization (each distinct word encodes
    once per batch). Appends ``out_col array<string>``; stripping
    ``##`` and concatenating within a word reproduces the input word
    exactly unless it tokenized to [UNK] (tested)."""
    vocab = set(model["vocab"])
    lowercase = model.get("lowercase", True)
    fields = df.schema.fieldNames()

    def run(batches):
        for pdf in batches:
            cache: dict[str, list[str]] = {}

            def enc(text):
                toks: list[str] = []
                t = text.lower() if lowercase else text
                for w in t.split():
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, vocab)
                    toks.extend(got)
                return toks

            pdf = pdf.copy()
            pdf[out_col] = [enc(t) for t in pdf[text_col]]
            yield pdf

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<string>"]
    )
    return df.mapInPandas(run, schema).select(*fields, out_col)
