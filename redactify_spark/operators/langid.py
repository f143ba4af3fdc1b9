"""Char-n-gram-profile language identification (VERDICT r3 #5).

The classic character-trigram text-categorization method (Cavnar &
Trenkle 1994, "N-Gram-Based Text Categorization", re-popularized as the
multinomial-NB variant by langid.py, Lui & Baldwin 2012): each language
gets a trigram profile built from a vendored sample text; a document is
classified by summing per-trigram log-probabilities and taking the
argmax.  Everything is deterministic and offline -- the samples below
are the ONLY training data, so the profile build is reproducible from
this file alone.

Engine shape (fully native, no Python in the scoring path):
  doc -> normalize (lower, accent-fold, non-letters to space, pad)
      -> explode char trigrams                      (narrow)
      -> broadcast-join the profile table           (vocab x langs rows,
         a few thousand -- always broadcastable)
      -> groupBy (doc, lang) sum log-probs          (map-side combinable;
         the shuffle carries at most n_docs x n_langs rows)
      -> per-doc argmax window                      (per-doc partition)
Log-probs are pre-quantized to integer MICRO-log units (floor(x*1e6 +
0.5)), so score sums are exact integers and the DuckDB oracle -- which
REBUILDS the same profiles in SQL from the same sample strings -- gets
bit-identical scores regardless of float summation order.

Scale: the profile is constant-size; per-doc cost is linear in text
length; no stage depends on corpus size except the one combinable
groupBy.  Trigrams not in the fixed vocabulary are dropped before the
shuffle (the langid.py feature-set restriction), so boilerplate-heavy
corpora do not inflate it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Accent folding map (1 codepoint -> 1 codepoint, applied after
# lower()).  Shared VERBATIM with the DuckDB oracle via oracle_sql()'s
# interpolation -- edit only here.
ACCENT_MAP = {
    "á": "a", "à": "a", "â": "a", "ä": "a", "ã": "a", "å": "a", "ă": "a",
    "ą": "a", "é": "e", "è": "e", "ê": "e", "ë": "e", "ę": "e", "í": "i",
    "ì": "i", "î": "i", "ï": "i", "ı": "i", "ó": "o", "ò": "o", "ô": "o",
    "ö": "o", "õ": "o", "ú": "u", "ù": "u", "û": "u", "ü": "u", "ç": "c",
    "ć": "c", "č": "c", "ñ": "n", "ń": "n", "ý": "y", "ś": "s", "ş": "s",
    "š": "s", "ß": "s", "ź": "z", "ż": "z", "ž": "z", "ł": "l", "ğ": "g",
    "ț": "t", "ș": "s", "œ": "e", "æ": "e", "ř": "r", "ď": "d", "đ": "d",
}
ACCENTS_FROM = "".join(ACCENT_MAP)
ACCENTS_TO = "".join(ACCENT_MAP.values())

# Vendored training samples: ~70 words of generic prose per language
# (function-word-dense on purpose; apostrophes avoided so the strings
# embed directly in SQL).  These are the entire training corpus.
LANG_SAMPLES = {
    "en": ("the quick brown fox jumps over the lazy dog and the people "
           "who were there said that it was one of the best things they "
           "had ever seen in their lives because there is nothing better "
           "than a good story about what happened when everyone was "
           "young and the world seemed full of things to do and places "
           "to go with friends and family during the long summer days"),
    "de": ("der schnelle braune fuchs springt über den faulen hund und "
           "die leute die dort waren sagten dass es eines der besten "
           "dinge war die sie je in ihrem leben gesehen hatten denn es "
           "gibt nichts besseres als eine gute geschichte darüber was "
           "geschah als alle jung waren und die welt voller dinge schien "
           "die man mit freunden und familie während der langen "
           "sommertage tun konnte"),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux "
           "et les gens qui étaient là ont dit que c était une des "
           "meilleures choses qu ils avaient jamais vues dans leur vie "
           "parce qu il n y a rien de mieux qu une bonne histoire sur ce "
           "qui s est passé quand tout le monde était jeune et que le "
           "monde semblait plein de choses à faire et d endroits où "
           "aller avec des amis et la famille pendant les longues "
           "journées d été"),
    "es": ("el rápido zorro marrón salta sobre el perro perezoso y la "
           "gente que estaba allí dijo que era una de las mejores cosas "
           "que habían visto en su vida porque no hay nada mejor que una "
           "buena historia sobre lo que pasó cuando todos eran jóvenes y "
           "el mundo parecía lleno de cosas que hacer y lugares a donde "
           "ir con amigos y familia durante los largos días de verano"),
    "it": ("la rapida volpe marrone salta sopra il cane pigro e le "
           "persone che erano lì hanno detto che era una delle cose "
           "migliori che avessero mai visto nella loro vita perché non c "
           "è niente di meglio di una bella storia su ciò che accadde "
           "quando tutti erano giovani e il mondo sembrava pieno di cose "
           "da fare e di posti dove andare con gli amici e la famiglia "
           "durante le lunghe giornate d estate"),
    "pt": ("a rápida raposa marrom salta sobre o cão preguiçoso e as "
           "pessoas que estavam lá disseram que foi uma das melhores "
           "coisas que já tinham visto na vida porque não há nada melhor "
           "do que uma boa história sobre o que aconteceu quando todos "
           "eram jovens e o mundo parecia cheio de coisas para fazer e "
           "lugares para ir com amigos e família durante os longos dias "
           "de verão"),
    "nl": ("de snelle bruine vos springt over de luie hond en de mensen "
           "die daar waren zeiden dat het een van de beste dingen was "
           "die ze ooit in hun leven hadden gezien want er is niets "
           "beters dan een goed verhaal over wat er gebeurde toen "
           "iedereen jong was en de wereld vol leek met dingen om te "
           "doen en plaatsen om naartoe te gaan met vrienden en familie "
           "tijdens de lange zomerdagen"),
    "sv": ("den snabba bruna räven hoppar över den lata hunden och "
           "människorna som var där sade att det var en av de bästa "
           "sakerna de någonsin sett i sina liv eftersom det inte finns "
           "något bättre än en bra berättelse om vad som hände när alla "
           "var unga och världen verkade full av saker att göra och "
           "platser att besöka med vänner och familj under de långa "
           "sommardagarna"),
    "pl": ("szybki brązowy lis skacze nad leniwym psem a ludzie którzy "
           "tam byli powiedzieli że to była jedna z najlepszych rzeczy "
           "jakie kiedykolwiek widzieli w swoim życiu ponieważ nie ma "
           "nic lepszego niż dobra opowieść o tym co się wydarzyło gdy "
           "wszyscy byli młodzi a świat wydawał się pełen rzeczy do "
           "zrobienia i miejsc do odwiedzenia z przyjaciółmi i rodziną "
           "podczas długich letnich dni"),
    "tr": ("hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve "
           "orada olan insanlar bunun hayatlarında gördükleri en iyi "
           "şeylerden biri olduğunu söylediler çünkü herkesin genç "
           "olduğu ve dünyanın arkadaşlar ve aile ile uzun yaz "
           "günlerinde yapılacak şeylerle ve gidilecek yerlerle dolu "
           "göründüğü zamanlar hakkında güzel bir hikayeden daha iyi bir "
           "şey yoktur"),
}

TOP_K = 60  # trigrams kept per language (ties: count desc, trigram asc)


def _normalize_py(s: str) -> str:
    """Python mirror of the native normalization: lower -> accent-fold
    -> non-letter runs to single space -> trim.  Used only to build the
    profile from the vendored samples (tiny, driver-side)."""
    import re
    s = s.lower().translate(str.maketrans(ACCENTS_FROM, ACCENTS_TO))
    return re.sub("[^a-z]+", " ", s).strip()


def _trigrams_py(s: str) -> list[str]:
    p = f" {s} "
    return [p[i:i + 3] for i in range(len(p) - 2)]


def build_profiles() -> tuple[list[tuple[str, str, int]], int]:
    """-> (rows, vocab_size): dense (ngram, lang, logp_micro) over
    vocab x languages, where vocab is the union of each language's
    TOP_K most frequent sample trigrams and logp_micro =
    floor(ln((cnt+1)/(tot+V))*1e6 + 0.5) with tot = that language's
    total count over the vocab (add-one smoothing over the restricted
    feature set -- the langid.py construction)."""
    counts: dict[str, dict[str, int]] = {}
    for lang, sample in LANG_SAMPLES.items():
        c: dict[str, int] = {}
        for g in _trigrams_py(_normalize_py(sample)):
            c[g] = c.get(g, 0) + 1
        counts[lang] = c
    vocab: set[str] = set()
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
        vocab.update(g for g, _ in top)
    v = len(vocab)
    rows = []
    for lang, c in counts.items():
        tot = sum(c.get(g, 0) for g in vocab)
        for g in sorted(vocab):
            lp = math.log((c.get(g, 0) + 1) / (tot + v))
            rows.append((g, lang, int(math.floor(lp * 1e6 + 0.5))))
    return rows, v


def normalize_expr(text: Column) -> Column:
    """Native mirror of _normalize_py."""
    folded = F.translate(F.lower(text), ACCENTS_FROM, ACCENTS_TO)
    return F.trim(F.regexp_replace(folded, "[^a-z]+", " "))


def lang_id_ngram(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, lang_pred, score_micro, n_ngrams): per-document language
    via trigram-profile NB.  Documents with zero in-vocabulary trigrams
    (empty, non-Latin, pure digits) predict 'und'.  Ties break to the
    lexicographically smallest language code."""
    spark = docs.sparkSession
    rows, _ = build_profiles()
    prof = spark.createDataFrame(rows, "ngram string, lang string, "
                                       "logp_micro long")
    norm = normalize_expr(F.col(text_col))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    tris = F.when(
        norm == "", F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(1), F.length(padded) - 2),
        lambda i: F.substring(padded, i, 3)))
    exploded = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode(tris).alias("ngram")))
    scores = (exploded.join(F.broadcast(prof), "ngram")
              .groupBy("doc_id", "lang")
              .agg(F.sum("logp_micro").alias("score_micro"),
                   F.count("*").cast("long").alias("n_ngrams")))
    rn = F.row_number().over(
        Window.partitionBy("doc_id")
              .orderBy(F.col("score_micro").desc(), F.col("lang").asc()))
    best = (scores.withColumn("_rn", rn).where(F.col("_rn") == 1)
            .select("doc_id", F.col("lang").alias("lang_pred"),
                    "score_micro", "n_ngrams"))
    ids = docs.select(F.col(id_col).alias("doc_id")).distinct()
    return (ids.join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"),
                    F.coalesce("score_micro", F.lit(0)).alias("score_micro"),
                    F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams")))
