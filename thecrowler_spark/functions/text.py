"""Text kernels: normalization, keywords, language ID, quality, fingerprints.

All JVM-side Column expressions (no Python in the hot path). Semantics
re-expressed from the reference:

- ``normalize_text``      ← ``normalizeText``        /root/reference/pkg/crawler/keywords.go:306-326
- ``extract_keywords``    ← ``extractContentKeywords`` + ``normalizeKeyword`` + ``isKeyword``
                            /root/reference/pkg/crawler/keywords.go:124-230
- ``detect_lang_expr``    ← stopword-ratio heuristic standing in for whatlanggo
                            (/root/reference/pkg/crawler/web.go:3370-3401) — deterministic stub.

Token-split note: the reference splits on unicode space/punct/symbol
(``strings.FieldsFunc`` keywords.go:205-208). We define the equivalent
class as "anything not [a-z0-9]" after lowercasing — identical on the
synthetic corpora, and shared verbatim by the DuckDB oracle and the
pure-Python parity oracle so the equivalence is testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Compact English stopword set (standard public list; the reference
#: loads a much larger one from support/stopWords.json — the *filtering
#: rule* is what we reproduce, with this list pinned on both engine and
#: oracle sides).
STOPWORDS_EN = (
    "a an and are as at be but by for from has have he her his i if in into is it its "
    "me my no not of on or our she so that the their them they this to was we were "
    "what when where which who will with you your all can had him more one out some "
    "there these those too up use very would about after also any because been before "
    "being between both did do does down during each few further here how itself just "
    "most now only other over own same should such than then through under until while"
).split()

#: min/max keyword length — /root/reference/pkg/crawler/keywords.go:148,184.
KEYWORD_MIN_LEN = 3
KEYWORD_MAX_LEN = 45

_TOKEN_SPLIT_RE = "[^a-z0-9]+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize_text(c: Column | str) -> Column:
    """Tag-strip → punctuation→space → lowercase → whitespace-collapse.

    Reference: ``normalizeText`` /root/reference/pkg/crawler/keywords.go:306-326.
    """
    t = _col(c)
    t = F.regexp_replace(t, "<[^>]*>", " ")
    t = F.regexp_replace(t, """[.,?!:;'"(){}<>\\-]""", " ")
    t = F.lower(t)
    t = F.trim(F.regexp_replace(t, r"\s+", " "))
    return t


def tokens(c: Column | str) -> Column:
    """Lowercased alnum tokens (array<string>, empties removed)."""
    arr = F.split(F.lower(_col(c)), _TOKEN_SPLIT_RE)
    return F.filter(arr, lambda w: w != "")


def keywords_array(c: Column | str) -> Column:
    """Per-document keyword list: tokens filtered by the reference rule.

    Rule (keywords.go:134-230): length in [3,45], not an English stop
    word. Duplicates KEPT (occurrence counting happens downstream,
    crawler.go:1819-1824).
    """
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    return F.filter(
        tokens(c),
        lambda w: (F.length(w) >= KEYWORD_MIN_LEN)
        & (F.length(w) <= KEYWORD_MAX_LEN)
        & ~F.array_contains(sw, w),
    )


def unique_preserving(arr: Column | str) -> Column:
    """Order-preserving dedup — Go ``unique`` keywords.go:232-246.
    Spark's ``array_distinct`` keeps first occurrence, same contract."""
    return F.array_distinct(_col(arr))


#: per-LATIN-language marker words (n-gram-heuristic stand-in for
#: whatlanggo's trigram scoring, web.go:3370-3401). Dict ORDER is the
#: tie-break priority. This dict covers the LATIN script branch of
#: :func:`detect_lang_expr`; non-Latin scripts are resolved by the
#: codepoint-range script pre-classifier (SCRIPT_CLASSES) first, the
#: same script-then-language shape whatlanggo uses.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "que", "es"),
    "fr": ("le", "les", "des", "est", "une"),
    "de": ("der", "die", "und", "ist", "das"),
    "it": ("il", "che", "di", "per", "sono"),
    "pt": ("um", "uma", "os", "para", "como"),
    "nl": ("het", "een", "van", "niet", "zijn"),
    "sv": ("och", "att", "det", "som", "inte"),
    # r3 extension toward the ISO map's breadth (VERDICT r2 item 6) —
    # same dict-order tie-break contract, ASCII-latin markers only
    # (diacritics would never survive the [a-z0-9] tokenizer class, so
    # e.g. the vi/cs markers are the diacritic-free function words).
    "da": ("jeg", "ikke", "og", "har", "til"),
    "fi": ("ja", "on", "ei", "mutta", "joka"),
    "pl": ("nie", "jest", "tak", "ale", "czy"),
    "tr": ("bir", "ve", "bu", "ile", "ne"),
    "ro": ("este", "nu", "cu", "pentru", "sunt"),
    "cs": ("je", "se", "na", "ale", "jako"),
    "id": ("yang", "dan", "di", "itu", "dengan"),
    "ms": ("kerana", "boleh", "anda", "ialah", "untuk"),
    "vi": ("khong", "duoc", "nguoi", "mot", "cua"),
    "hr": ("je", "se", "da", "su", "nije"),
    "sk": ("je", "sa", "na", "ako", "ktory"),
    "sl": ("je", "se", "da", "in", "tudi"),
    "ca": ("amb", "els", "una", "dels", "aquest"),
    "af": ("die", "en", "het", "nie", "vir"),
    "cy": ("yn", "yr", "ac", "bod", "wedi"),
    "sq": ("dhe", "nuk", "eshte", "por", "sipas"),
}

def _urange(a: int, b: int) -> str:
    """Inclusive codepoint range as literal chars — the SAME class
    string drops into Java regex (Spark) and RE2 (the DuckDB oracle)."""
    return f"{chr(a)}-{chr(b)}"


#: Unicode script classes for the pre-classifier (whatlanggo detects
#: the script first, then scores languages within it —
#: /root/reference/pkg/crawler/web.go:3370-3401 via whatlanggo.Detect).
#: ORDER is the dominance tie-break; latin first so an all-zero count
#: vector falls through to the Latin marker argmax ('unknown').
SCRIPT_CLASSES: "list[tuple[str, str]]" = [
    ("latin", "A-Za-z"),
    ("han", _urange(0x4E00, 0x9FFF)),                       # CJK Unified
    ("kana", _urange(0x3040, 0x30FF)),                      # hiragana+katakana
    ("hangul", _urange(0xAC00, 0xD7AF) + _urange(0x1100, 0x11FF)),
    ("cyrillic", _urange(0x0400, 0x04FF)),
    ("arabic", _urange(0x0600, 0x06FF)),
    ("devanagari", _urange(0x0900, 0x097F)),
    ("greek", _urange(0x0370, 0x03FF)),
    ("hebrew", _urange(0x0590, 0x05FF)),
    ("thai", _urange(0x0E00, 0x0E7F)),
]

#: scripts that map to a single ISO-639-1 code (the codes the
#: reference's langMap expects for these scripts: kor/ara/hin/ell/heb/tha)
SCRIPT_LANG: dict[str, str] = {
    "hangul": "ko",
    "arabic": "ar",
    "devanagari": "hi",
    "greek": "el",
    "hebrew": "he",
    "thai": "th",
}

#: lowercase Cyrillic token class (uppercase folds into 0430-045F via
#: lower(); 0450-045F carries the uk/sr extras і ї є ј љ њ џ ѐ ѝ)
CYR_TOKEN_CLASS = _urange(0x0430, 0x045F) + chr(0x0491)  # + ґ

#: Cyrillic is multi-language — marker argmax like the Latin branch.
#: Dict order is the tie-break; zero hits fall back to 'ru' (the
#: script is KNOWN Cyrillic, so 'unknown' would discard information).
CYRILLIC_MARKERS: dict[str, tuple[str, ...]] = {
    "ru": ("и", "в", "не", "что", "как"),          # и в не что как
    "uk": ("і", "що", "це", "та", "як"),                # і що це та як
    "bg": ("е", "да", "се", "това", "към"),  # е да се това към
    "sr": ("је", "у", "ово", "су", "није"),  # је у ово су није
}


#: whatlanggo ISO-639-3 name → ISO-639-1 code, full transcription of
#: langMap /root/reference/pkg/crawler/types.go:416-479.
#: NOTE "cnr" (Montenegrin) → "ru" is a FAITHFUL transcription of the
#: reference's own map (types.go:436) — parity, do not "fix".
ISO_639_MAP: dict[str, str] = {
    "unknown": "unknown", "afr": "af", "sqi": "sq", "amh": "am", "ara": "ar",
    "hye": "hy", "asm": "as", "aze": "az", "aze_cyrl": "az", "bel": "be",
    "ben": "bn", "bod": "bo", "bos": "bs", "bul": "bg", "cat": "ca",
    "ceb": "ceb", "ces": "cs", "cha": "ch", "cmn": "zh", "cnr": "ru",
    "cos": "co", "cre": "cr", "cym": "cy", "dan": "da", "deu": "de",
    "div": "dv", "ell": "el", "eng": "en", "rus": "ru", "spa": "es",
    "por": "pt", "ita": "it", "fra": "fr", "ukr": "uk", "pol": "pl",
    "slv": "sl", "nld": "nl", "fin": "fi", "tur": "tr", "heb": "he",
    "hin": "hi", "jpn": "ja", "kor": "ko", "zho": "zh", "vie": "vi",
    "ind": "id", "msa": "ms", "tha": "th", "kat": "ka", "kat_old": "ka",
    "hrv": "hr", "ron": "ro", "srp": "sr", "srp_latn": "sr", "slk": "sk",
    "slk_frak": "sk", "slk_old": "sk", "slk_1929": "sk", "slk_1996": "sk",
    "slk_2006": "sk", "slk_2010": "sk", "slk_2018": "sk",
}


def tokens_cls(c: Column | str, cls: str) -> Column:
    """Lowercased tokens over an arbitrary char class (non-Latin
    tokenizers for the script-specific marker argmax)."""
    arr = F.split(F.lower(_col(c)), f"[^{cls}]+")
    return F.filter(arr, lambda w: w != "")


def _marker_argmax(toks: Column, markers: dict[str, tuple[str, ...]], fallback: str) -> Column:
    """Argmax of marker-word hit counts with dict-order tie-break.

    One (hits, priority, lang) struct per language; array_max's struct
    compare = argmax on hits with dict-order priority on ties — each
    hit count appears in the expression tree exactly ONCE (the r2 form
    was an O(n_langs²) when-chain that re-embedded every hit column,
    which stops being free at 24 languages). The token array is bound
    once (:func:`bind_once`) so the per-language filters scan ONE
    materialized array instead of re-tokenizing the document per
    language.
    """
    langs = list(markers)

    def per_toks(tk: Column) -> Column:
        entries = []
        for i, (lang, words) in enumerate(markers.items()):
            m = F.array(*[F.lit(w) for w in words])
            hits = F.size(F.filter(tk, lambda w: F.array_contains(m, w)))
            entries.append(
                F.struct(
                    hits.alias("h"),
                    F.lit(len(langs) - i).alias("prio"),
                    F.lit(lang).alias("lang"),
                )
            )
        best = F.array_max(F.array(*entries))
        return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit(fallback))

    return bind_once(toks, per_toks)


def script_counts(c: Column | str) -> dict[str, Column]:
    """Per-script codepoint counts (pure Column: one regex pass per
    script). ``regexp_count(t, '[cls]')`` counts the matching
    codepoints directly — value-identical to the previous
    ``length(regexp_replace(t, '[^cls]', ''))`` (each match is one
    codepoint) but without building an intermediate string per script
    per row (r6: the 10-class count stack measured 34 s over a 185k-doc
    corpus in the replace form)."""
    t = _col(c)
    return {
        name: F.regexp_count(t, F.lit(f"[{cls}]"))
        for name, cls in SCRIPT_CLASSES
    }


#: dominant-script pooling order — declaration order is the tie-break
#: (latin first: an all-zero count vector falls through to Latin).
#: Han + kana pool as 'cjk'; the rest are their own class.
SCRIPT_DOMINANCE: tuple[str, ...] = (
    "latin", "cjk", "hangul", "cyrillic", "arabic",
    "devanagari", "greek", "hebrew", "thai",
)


def dominant_script(c: Column | str) -> Column:
    """Dominant script name via codepoint-range count argmax
    (declaration-order tie-break per SCRIPT_DOMINANCE).

    ASCII fast path (r6): a pure-ASCII document has zero characters in
    every non-Latin class, so the argmax is 'latin' by the declared
    tie-break (latin leads SCRIPT_DOMINANCE) — one allocation-free
    rlike scan replaces the 9-class count stack for the common case;
    CASE lazily evaluates the full argmax only for non-ASCII rows.
    Value-identical by construction."""
    t = _col(c)
    cnt = script_counts(t)
    pooled = {**cnt, "cjk": cnt["han"] + cnt["kana"]}
    entries = [
        F.struct(
            pooled[name].alias("h"),
            F.lit(len(SCRIPT_DOMINANCE) - i).alias("prio"),
            F.lit(name).alias("s"),
        )
        for i, name in enumerate(SCRIPT_DOMINANCE)
    ]
    return F.when(~t.rlike("[^\\x00-\\x7f]"), F.lit("latin")).otherwise(
        F.array_max(F.array(*entries))["s"]
    )


def cyrillic_marker_expr(c: Column | str) -> Column:
    """The Cyrillic marker argmax on its own (fallback 'ru') — the
    inline fast path's Cyrillic resolution, and the quality path's
    fallback when a Cyrillic doc hits no trigram profile."""
    return _marker_argmax(tokens_cls(c, CYR_TOKEN_CLASS), CYRILLIC_MARKERS, "ru")


def nonlatin_lang_expr(
    c: Column | str, script: Column, trigram_scripts: tuple = ()
) -> Column:
    """Language for the NON-Latin script branches (NULL when the
    script is Latin — the caller picks the Latin strategy: marker
    argmax for the inline fast path, trigram profiles for the
    operators.langid quality path). CJK → 'ja' if any kana else 'zh';
    single-language scripts via SCRIPT_LANG; Cyrillic → marker argmax.
    ``trigram_scripts`` names scripts the caller resolves itself
    (returned as NULL here): the quality path scores trigram profiles
    for latin/cyrillic/arabic/devanagari and keeps the script-level
    answer only as its no-hit fallback."""
    cnt = script_counts(c)
    expr = F.when(
        script == F.lit("cjk"),
        F.when(cnt["kana"] > 0, F.lit("ja")).otherwise(F.lit("zh")),
    )
    for name, code in SCRIPT_LANG.items():
        if name in trigram_scripts:
            continue
        expr = expr.when(script == F.lit(name), F.lit(code))
    if "cyrillic" not in trigram_scripts:
        expr = expr.when(script == F.lit("cyrillic"), cyrillic_marker_expr(c))
    return expr


def detect_lang_expr(c: Column | str) -> Column:
    """Deterministic script-then-language ID (the whatlanggo shape,
    /root/reference/pkg/crawler/web.go:3370-3401).

    Phase 1 — script: codepoint-range counts per SCRIPT_CLASSES; the
    dominant script wins (argmax, declaration-order tie-break; Han and
    kana pool as 'cjk'). Phase 2 — language within script: CJK → 'ja'
    if any kana else 'zh'; Hangul/Arabic/Devanagari/Greek/Hebrew/Thai
    are single-language (SCRIPT_LANG); Cyrillic → marker argmax over
    CYRILLIC_MARKERS (ru/uk/bg/sr, fallback 'ru'); Latin → marker
    argmax over LANG_MARKERS (24 languages, fallback 'unknown').
    All pure Column expressions; the DuckDB oracle is generated from
    the same dicts so the engines cannot drift.

    This is the inline FAST path (one expression, no joins) used where
    langid rides along another projection (span page-info). The
    quality path — trigram profiles within the Latin script, the part
    marker words get wrong on close pairs — is
    :func:`thecrowler_spark.operators.langid.detect_language`.
    """
    script = dominant_script(c)
    latin_best = _marker_argmax(tokens(c), LANG_MARKERS, "unknown")
    return F.coalesce(nonlatin_lang_expr(c, script), latin_best)


def iso_lang_code(c: Column | str) -> Column:
    """``convertLangStrToLangCode`` (web.go:3397-3401): trim + lower +
    langMap lookup; a missing key yields Go's map zero value '' (empty
    string). One literal-map lookup, JVM-side."""
    key = F.lower(F.trim(_col(c)))
    mapping = F.create_map(*[F.lit(x) for k, v in ISO_639_MAP.items() for x in (k, v)])
    return F.coalesce(mapping[key], F.lit(""))


def token_count(c: Column | str) -> Column:
    """Whitespace-ish token count (training-data accounting)."""
    return F.size(tokens(c))


def quality_score(c: Column | str) -> Column:
    """Document quality score in [0,1]: length, alpha ratio, stopword ratio.

    A standard trainig-data heuristic (C4/Gopher-style): favor docs with
    healthy length, mostly-alphabetic characters, and a natural stopword
    ratio. Deterministic, SQL-expressible (oracle mirrors it).
    """
    t = _col(c)
    n_chars = F.length(t).cast("double")
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(F.lower(t), "[^a-z ]", "")).cast("double") / n_chars,
    ).otherwise(F.lit(0.0))
    toks = tokens(t)
    n_tok = F.size(toks).cast("double")
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    sw_ratio = F.when(
        n_tok > 0, F.size(F.filter(toks, lambda w: F.array_contains(sw, w))).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    sw_score = F.least(sw_ratio * F.lit(4.0), F.lit(1.0))
    return F.round((len_score + alpha_ratio + sw_score) / F.lit(3.0), 6)


def fingerprint_md5(c: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (portable —
    DuckDB computes the identical digest)."""
    return F.md5(normalize_text(c))


def bind_once(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE per row and hand the materialized value to
    ``fn`` as a lambda variable.

    Higher-order-function lambdas re-evaluate captured OUTER expressions
    per element (no common-subexpression elimination inside HOFs), so
    ``transform(seq, i -> slice(tokens(text), i, k))`` re-splits the
    whole document for EVERY index — O(tokens²) on long docs. Wrapping
    the array in a 1-element ``transform`` makes it a bound lambda
    variable: inner lambdas then reference the materialized array.
    """
    return F.transform(F.array(col), fn)[0]


def _capped_tokens(c: Column | str, max_tokens: int | None) -> Column:
    """tokens(), truncated to the first ``max_tokens`` — the executor-
    memory guard for the array-materializing kernels (winnow/shingles
    build O(tokens) arrays per ROW; a single adversarial multi-MB doc
    would otherwise be memory-bound before it is CPU-bound)."""
    toks = tokens(c)
    if max_tokens is None:
        return toks
    return F.slice(toks, 1, max_tokens)


def shingles(c: Column | str, k: int = 3, max_tokens: int | None = None) -> Column:
    """k-token shingles of the normalized text as array<string>.

    Built from JVM array ops only. ``max_tokens`` truncates pathological
    docs (None = exact classic mode, the oracle default). The token
    array is bound once per row (:func:`bind_once`).

    r6: the window join is a fold of k−1 shifted ``zip_with`` concats
    (g ← zip_with(g, toks[j:], x ++ ' ' ++ y)) instead of a transform
    over an index range doing ``array_join(slice(toks, i, k))`` per
    position — the slice form allocates a k-element array plus join
    machinery per shingle and measured 5× slower (3.1 s vs 0.6 s per
    pass over a 185k-doc corpus at k=2; values bit-identical —
    ``concat(a,' ',b)`` ≡ ``array_join([a,b], ' ')``). zip_with pads the
    shorter (shifted) side with null and concat null-propagates, so the
    final slice to n−k+1 drops exactly the padded tail.
    """

    def per_toks(toks: Column) -> Column:
        n = F.size(toks)
        g = toks
        for j in range(1, k):
            shifted = F.slice(toks, j + 1, F.greatest(n - j, F.lit(0)))
            g = F.zip_with(g, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
        grams = F.slice(g, 1, F.greatest(n - k + 1, F.lit(0)))
        return F.when(n >= k, grams).otherwise(
            F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(F.array())
        )

    return bind_once(_capped_tokens(c, max_tokens), per_toks)


def ngrams(c: Column | str, n: int = 2) -> Column:
    """n-token n-grams as array<string> (alias of :func:`shingles` with
    the training-data-quality naming)."""
    return shingles(c, k=n)


def winnow_fingerprints(
    c: Column | str, k: int = 3, w: int = 4, max_tokens: int | None = 100_000
) -> Column:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every k-gram, slide a window
    of ``w`` consecutive hashes, keep each window's MINIMUM; the
    distinct mins are the fingerprint set. Guarantees any shared run of
    ≥ w+k−1 tokens between two documents shares ≥1 fingerprint, with a
    ~2/(w+1) sampling density — the local-sampling sibling of MinHash
    (which samples globally and loses locality).

    All JVM array expressions; the k-gram hash is the md5-prefix
    integer both engines compute identically, so the oracle can
    mirror the exact fingerprint set. Empty/short docs: < k tokens →
    empty; < w k-grams → one global min. ``max_tokens`` (default 100k)
    truncates adversarial multi-MB docs before the O(tokens×w) window
    arrays materialize — fingerprints beyond the cap are dropped, the
    prefix's fingerprints are unchanged. Token and gram arrays are each
    bound once per row (:func:`bind_once`): HOF lambdas re-evaluate
    captured outer expressions per element, so the unbound form
    re-tokenized the document per gram index — O(tokens²) on long docs.
    """
    empty = F.array().cast("array<bigint>")

    def per_toks(toks: Column) -> Column:
        n = F.size(toks)
        grams0 = F.transform(
            F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
            lambda i: F.conv(
                F.substring(F.md5(F.array_join(F.slice(toks, i + 1, k), " ")), 1, 8), 16, 10
            ).cast("long"),
        )

        def per_grams(grams: Column) -> Column:
            g = F.size(grams)
            return F.when(
                n < k, empty
            ).when(
                g < w, F.array(F.array_min(grams))
            ).otherwise(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), g - w),
                        lambda j: F.array_min(F.slice(grams, j + 1, w)),
                    )
                )
            )

        return bind_once(grams0, per_grams)

    return bind_once(_capped_tokens(c, max_tokens), per_toks)


def repetition_signals(c: Column | str, n: int = 2) -> tuple[Column, Column, Column]:
    """Gopher-style repetition signals over the token n-grams of a doc.

    Returns integer Columns ``(n_ngrams, n_distinct, top_count)``:
    total n-gram occurrences, distinct n-grams, and the count of the
    most frequent n-gram. Downstream filters derive the Gopher rules
    ("fraction of duplicate n-grams" = 1 - distinct/total; "top n-gram
    fraction" = top/total) — kept as exact integers here so the
    DuckDB-oracle hash comparison never hits a float boundary.

    Divergence note: Gopher measures the fraction of *characters* inside
    duplicate n-grams; we use occurrence fractions (same signal, exact
    arithmetic). Pure JVM array expressions — no shuffle, no Python.
    top_count is a sort-then-scan (longest equal run of the SORTED gram
    array via ``aggregate``): O(t log t) per row. The naive
    transform-over-distinct form is O(distinct × total) — and because
    HOF lambdas re-evaluate captured outer expressions per element, it
    re-tokenized the document per distinct gram, which dominated the
    pipeline's quality stage.
    """
    grams = ngrams(c, n)
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))

    def longest_run(g: Column) -> Column:
        init = F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

        def step(acc: Column, x: Column) -> Column:
            run = F.when(
                acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1
            ).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run.alias("run"),
                F.greatest(acc["best"], run).alias("best"),
            )

        return F.aggregate(F.sort_array(g), init, step, lambda acc: acc["best"])

    top = bind_once(grams, longest_run)
    return (
        total.cast("int"),
        distinct.cast("int"),
        top.cast("int"),
    )


#: PII patterns applied in ORDER (email before phone so the digits in a
#: mailbox never half-match a phone). RE2/Java-compatible subset: no
#: backrefs, no lookaround, ASCII \b only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9 ().-]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(c: Column | str) -> Column:
    """Scrub emails / IPv4s / intl phone numbers to typed placeholders.

    Standard training-data sanitization pass (the reference's scope
    stops at UTF-8/DB sanitization — this extends the same family for
    LLM pipelines). Patterns are a deliberately portable regex subset so
    Spark (Java regex) and DuckDB (RE2) rewrite byte-identically; the
    application ORDER is part of the contract.
    """
    out = _col(c)
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(c: Column | str) -> dict[str, Column]:
    """Match counts per PII class (email/ipv4/phone) as int Columns.

    Counted on the PROGRESSIVELY REDACTED text exactly like
    :func:`redact_pii` applies its rewrites, so a mailbox's digits are
    never double-counted as a phone."""
    out: dict[str, Column] = {}
    cur = _col(c)
    for name, pat, repl in PII_PATTERNS:
        out[name] = F.regexp_count(cur, F.lit(pat)).cast("int")
        cur = F.regexp_replace(cur, pat, repl)
    return out


def token_count_bpe(c: Column | str) -> Column:
    """BPE-ish subword count: letter runs, digit runs, and punctuation
    runs count as separate tokens (the GPT-2 pretokenizer's coarse
    structure), approximating trained-tokenizer counts without a vocab.
    JVM-side via ``regexp_count`` — no Python."""
    return F.regexp_count(_col(c), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"))
