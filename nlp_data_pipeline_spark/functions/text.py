"""Reference-parity text operators as native Column expressions.

Each builder mirrors one operator of the reference app
(/root/reference/nlp_data_tagging.py) with identical semantics, but
expressed as JVM-side ``pyspark.sql.functions`` so the whole text
pipeline stays inside whole-stage codegen — no Python UDFs anywhere in
this module. That is the difference between "runs on 50 PDFs" and
"runs on 100 TB": a regex + array expression pipeline scales linearly
with executors and shuffles nothing.

Reference citations (file:line into /root/reference/nlp_data_tagging.py):
- STOP_WORDS set ........................ :19-32
- preprocess_text ....................... :49-66
- simple_tokenize ....................... :68-76
- split_into_sentences .................. :81-84
- extractive_summarization early-exit ... :91-92
- summarize_text truncation ............. :118-130
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact copy of the reference's 118-word stopword set (:19-32) — this is
# engine *configuration data* (a word list), not engine code.
STOP_WORDS: frozenset[str] = frozenset({
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you',
    'your', 'yours', 'yourself', 'yourselves', 'he', 'him', 'his',
    'himself', 'she', 'her', 'hers', 'herself', 'it', 'its', 'itself',
    'they', 'them', 'their', 'theirs', 'themselves', 'what', 'which',
    'who', 'whom', 'this', 'that', 'these', 'those', 'am', 'is', 'are',
    'was', 'were', 'be', 'been', 'being', 'have', 'has', 'had', 'having',
    'do', 'does', 'did', 'doing', 'a', 'an', 'the', 'and', 'but', 'if',
    'or', 'because', 'as', 'until', 'while', 'of', 'at', 'by', 'for',
    'with', 'through', 'during', 'before', 'after', 'above', 'below',
    'up', 'down', 'in', 'out', 'on', 'off', 'over', 'under', 'again',
    'further', 'then', 'once', 'here', 'there', 'when', 'where', 'why',
    'how', 'all', 'any', 'both', 'each', 'few', 'more', 'most', 'other',
    'some', 'such', 'no', 'nor', 'not', 'only', 'own', 'same', 'so',
    'than', 'too', 'very', 'can', 'will', 'just', 'should', 'now',
})

STOP_WORDS_SORTED: list[str] = sorted(STOP_WORDS)


def clean_text(col: Column | str) -> Column:
    """preprocess_text parity (:49-66).

    whitespace collapse → lowercase → strip non-word/space/period chars
    → re-collapse spaces.  Pure regexp_replace chain: stays in codegen.

    Order note: the reference strips BEFORE lowercasing (:58, :61); we
    lowercase first so the function is IDEMPOTENT — Java's full case
    mapping can emit combining marks (lower('İ') = 'i' + U+0307) that
    are outside [\\p{L}\\p{N}_\\s.] and would survive one pass but not
    two. Lowering first lets the strip remove such marks immediately
    (also converging with DuckDB's mark-free simple case mapping); for
    every character whose lowercase stays in the same character class —
    i.e. all ordinary text — the result is byte-identical to the
    reference's order.
    """
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))                       # "if not text: return ''"
    c = F.regexp_replace(c, r"\s+", " ")               # :55
    c = F.lower(c)                                     # :61
    # the reference's r'[^\w\s\.]' uses Python's UNICODE \w; Java's \w is
    # ASCII-only, so spell out the Unicode classes (\p{L}\p{N}_) to keep
    # accented/non-Latin characters exactly like the reference does.
    # (\s stays ASCII in both engines; the \s+ collapse above already
    # normalized exotic whitespace to ' '.)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}_\s\.]", " ")  # :58
    c = F.trim(F.regexp_replace(c, r" +", " "))        # :64 ' '.join(split())
    return c


def tokenize(col: Column | str, min_len_exclusive: int = 2) -> Column:
    """simple_tokenize parity (:68-76) returning array<string>.

    Splits on spaces, drops STOP_WORDS members (case-insensitive, :74)
    and tokens with len <= 2.  Higher-order `filter` runs JVM-side.
    """
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(c, " ")
    # membership via isin: >10 literals compiles to INSET (a hash-set
    # probe, O(1) per token) where array_contains over a literal array
    # is a linear scan of all 118 stopwords per token — measured 0.73s
    # -> 0.41s on the sf0.1 corpus token-frequency pass (round 14).
    return F.filter(
        toks,
        lambda t: (F.length(t) > min_len_exclusive)
        & ~F.lower(t).isin(*STOP_WORDS_SORTED)
        & (t != F.lit("")),
    )


def tokenize_joined(col: Column | str) -> Column:
    """simple_tokenize's actual return type: tokens re-joined by ' ' (:76)."""
    return F.array_join(tokenize(col), " ")


def sentences(col: Column | str, min_len_exclusive: int = 10) -> Column:
    """split_into_sentences parity (:81-84) returning array<string>.

    re.split(r'[.!?]+') then keep stripped sentences with len > 10.
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, r"[.!?]+")
    trimmed = F.transform(parts, lambda s: F.trim(s))
    return F.filter(trimmed, lambda s: F.length(s) > min_len_exclusive)


def truncate_at_word(col: Column | str, max_length: int) -> Column:
    """summarize_text length control parity (:126-128).

    If len > max_length: take the first max_length chars, cut at the last
    space (Python ``rsplit(' ', 1)[0]`` keeps everything when no space
    exists), append '...'.
    """
    c = F.col(col) if isinstance(col, str) else col
    head = F.substring(c, 1, max_length)
    # position of last space within head = len(head) - locate(' ', reverse(head)) + 1
    rev_pos = F.locate(" ", F.reverse(head))
    cut = F.when(rev_pos > 0, F.substring(head, 1, F.length(head) - rev_pos)).otherwise(head)
    return F.when(F.length(c) > max_length, F.concat(cut, F.lit("..."))).otherwise(c)


def fallback_summary(sentences_col: Column, text_col: Column, num_sentences: int = 3) -> Column:
    """Fallback-path summary parity (:108-116): first/middle/last sentence.

    indices = [0, len//2, -1][:num_sentences]; joined with '. ' + '.'.
    Early exit (:111-112): when len(sentences) <= num_sentences → text.
    """
    n = F.size(sentences_col)
    first = F.element_at(sentences_col, 1)
    middle = F.element_at(sentences_col, (F.floor(n / 2) + 1).cast("int"))
    last = F.element_at(sentences_col, -1)
    picks = [first, middle, last][:num_sentences]
    joined = F.concat(F.concat_ws(". ", *picks), F.lit("."))
    return F.when(n <= num_sentences, text_col).otherwise(joined)


def ngrams(tokens_col: Column, n: int) -> Column:
    """Order-preserving n-grams (space-joined) of an array<string>.

    Guarded for short arrays: Spark's ``sequence(1, stop)`` produces a
    DESCENDING [1, 0] when stop < 1 (default step −1), which would index
    element 0 and error — so arrays shorter than n yield [].
    """
    size = F.size(tokens_col)
    idx = F.sequence(F.lit(1), size - (n - 1))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(tokens_col, i + j) for j in range(n)])
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def word_count(col: Column | str) -> Column:
    """len(text.split()) equivalent — counts non-empty whitespace tokens."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.filter(F.split(c, r"\s+"), lambda t: t != F.lit("")))
