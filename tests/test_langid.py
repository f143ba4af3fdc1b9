"""Char-trigram-profile language ID: accuracy + determinism fixtures.

Held-out sentences (NOT drawn from the vendored training samples) must
classify correctly for all 10 languages; degenerate inputs predict
'und'; the profile build is deterministic.
"""

import pytest

from redactify_spark.operators.langid import (LANG_SAMPLES, build_profiles,
                                              lang_id_ngram)

HELD_OUT = [
    (1, "en", "She walked through the old market and asked where the "
              "train station was before it started to rain"),
    (2, "de", "Er ging durch die Stadt und fragte wo der Bahnhof ist "
              "weil er den Zug nehmen wollte"),
    (3, "fr", "Elle a marché dans la ville et a demandé où se trouve "
              "la gare pour prendre le train"),
    (4, "es", "Ella caminó por la ciudad y preguntó dónde está la "
              "estación para tomar el tren"),
    (5, "it", "Lei ha camminato per la città e ha chiesto dove si "
              "trova la stazione per prendere il treno"),
    (6, "pt", "Ela caminhou pela cidade e perguntou onde fica a "
              "estação para pegar o trem"),
    (7, "nl", "Zij liep door de stad en vroeg waar het station is "
              "omdat zij de trein wilde nemen"),
    (8, "sv", "Hon gick genom staden och frågade var stationen ligger "
              "eftersom hon ville ta tåget"),
    (9, "pl", "Ona szła przez miasto i zapytała gdzie jest dworzec "
              "ponieważ chciała pojechać pociągiem"),
    (10, "tr", "O şehirde yürüdü ve trene binmek için istasyonun "
               "nerede olduğunu sordu"),
    (11, "und", "12345 67890 !!! ### 42"),
    (12, "und", ""),
    (13, "und", "   \t\n  "),
    # non-Latin trigram languages (VERDICT r4 #3)
    (14, "ru", "Он шёл по городу и спросил где находится вокзал потому "
               "что хотел сесть на поезд"),
    (15, "uk", "Вона йшла містом і запитала де знаходиться вокзал тому "
               "що хотіла сісти на потяг"),
    (16, "el", "Περπάτησε στην πόλη και ρώτησε πού είναι ο σταθμός για "
               "να πάρει το τρένο"),
    (17, "ar", "مشى في المدينة وسأل أين توجد المحطة لأنه أراد أن يأخذ القطار"),
]

# script-level languages: (id, script, lang, text)
SCRIPT_HELD_OUT = [
    (21, "han", "zh", "他走过城市并询问火车站在哪里因为他想坐火车"),
    (22, "kana", "ja", "かれは まちを あるいて えきが どこに あるか たずねました"),
    (23, "han", "ja", "東京駅発の新幹線特急列車は高速運転だ"),   # han-dominant + kana -> ja
    (24, "hangul", "ko", "그는 도시를 걸으며 역이 어디에 있는지 물었다"),
    (25, "thai", "th", "เขาเดินผ่านเมืองและถามว่าสถานีรถไฟอยู่ที่ไหน"),
    (26, "hebrew", "he", "הוא הלך בעיר ושאל איפה תחנת הרכבת"),
    (27, "devanagari", "hi", "वह शहर से गुजरा और पूछा कि रेलवे स्टेशन कहाँ है"),
]


def test_langid_held_out_accuracy(spark):
    df = spark.createDataFrame([(i, t) for i, _, t in HELD_OUT],
                               ["doc_id", "text"])
    got = {r.doc_id: r.lang_pred for r in lang_id_ngram(df).collect()}
    for i, want, _ in HELD_OUT:
        assert got[i] == want, (i, want, got[i])


def test_langid_multiscript_script_level(spark):
    """Script-level routing: dominant Unicode script + mapped code;
    han with any kana present -> ja."""
    from redactify_spark.operators.langid import lang_id_multiscript
    df = spark.createDataFrame([(i, t) for i, _, _, t in SCRIPT_HELD_OUT],
                               ["doc_id", "text"])
    got = {r.doc_id: (r.script, r.lang_pred, r.score_micro, r.n_ngrams)
           for r in lang_id_multiscript(df).collect()}
    for i, script, lang, _ in SCRIPT_HELD_OUT:
        assert got[i][0] == script, (i, script, got[i])
        assert got[i][1] == lang, (i, lang, got[i])
        # script-level docs carry no trigram evidence
        assert got[i][2] == 0 and got[i][3] == 0, (i, got[i])


def test_langid_multiscript_trigram_routing(spark):
    """Trigram-capable scripts route through the profile scorer and
    agree with lang_id_ngram; letterless docs stay 'und'."""
    from redactify_spark.operators.langid import lang_id_multiscript
    df = spark.createDataFrame([(i, t) for i, _, t in HELD_OUT],
                               ["doc_id", "text"])
    tri = {r.doc_id: (r.lang_pred, r.score_micro)
           for r in lang_id_ngram(df).collect()}
    multi = {r.doc_id: (r.script, r.lang_pred, r.score_micro)
             for r in lang_id_multiscript(df).collect()}
    want_script = {"en": "latin", "de": "latin", "fr": "latin",
                   "es": "latin", "it": "latin", "pt": "latin",
                   "nl": "latin", "sv": "latin", "pl": "latin",
                   "tr": "latin", "ru": "cyrillic", "uk": "cyrillic",
                   "el": "greek", "ar": "arabic", "und": "none"}
    for i, want, _ in HELD_OUT:
        script, lang, score = multi[i]
        assert lang == tri[i][0] == want, (i, want, lang, tri[i][0])
        assert script == want_script[want], (i, want, script)
        if want != "und":
            assert score == tri[i][1]


def test_langid_training_samples_self_classify(spark):
    """Each vendored sample must classify as its own language (the
    training-set sanity floor for a profile method)."""
    rows = [(i, lang, s) for i, (lang, s)
            in enumerate(sorted(LANG_SAMPLES.items()))]
    df = spark.createDataFrame([(i, s) for i, _, s in rows],
                               ["doc_id", "text"])
    got = {r.doc_id: r.lang_pred for r in lang_id_ngram(df).collect()}
    for i, lang, _ in rows:
        assert got[i] == lang, (lang, got[i])


def test_langid_profile_build_deterministic():
    rows1, v1 = build_profiles()
    rows2, v2 = build_profiles()
    assert rows1 == rows2 and v1 == v2
    assert v1 == len({g for g, _, _ in rows1})
    assert len(rows1) == v1 * len(LANG_SAMPLES)
    # every log-prob strictly negative, quantized to micro-int
    assert all(isinstance(lp, int) and lp < 0 for _, _, lp in rows1)


def test_langid_partition_invariant(spark):
    """Prediction must not depend on input partitioning."""
    df = spark.createDataFrame([(i, t) for i, _, t in HELD_OUT],
                               ["doc_id", "text"])
    a = sorted((r.doc_id, r.lang_pred, r.score_micro)
               for r in lang_id_ngram(df).collect())
    b = sorted((r.doc_id, r.lang_pred, r.score_micro)
               for r in lang_id_ngram(df.repartition(7)).collect())
    assert a == b
