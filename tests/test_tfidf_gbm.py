"""TF-IDF model (driver + distributed fit parity) and the numpy GBM."""

import numpy as np

from name_matching_spark.functions.tfidf import TfidfModel
from name_matching_spark.model.gbm import GBMClassifier

CORPUS = [
    "john smith", "jane doe", "john wick", "agoda company limited",
    "apple incorporated", "winston scott", "hotel continental",
]


def test_tfidf_basics():
    m = TfidfModel.fit(CORPUS)
    assert m.cosine_pairs(["john smith"], ["john smith"])[0] == 1.0
    assert m.cosine_pairs(["john smith"], ["jane doe"])[0] == 0.0
    mid = m.cosine_pairs(["john smith"], ["john wick"])[0]
    assert 0.0 < mid < 1.0


def test_tfidf_max_df_prunes():
    docs = [f"common word{i}" for i in range(10)]
    m = TfidfModel.fit(docs, max_df=0.5)
    assert "common" not in m.vocab
    assert "word3" in m.vocab


def test_tfidf_roundtrip():
    m = TfidfModel.fit(CORPUS)
    m2 = TfidfModel.from_json(m.to_json())
    assert m2.vocab == m.vocab
    a = m.cosine_pairs(["john smith"], ["john wick"])
    b = m2.cosine_pairs(["john smith"], ["john wick"])
    assert np.allclose(a, b)


def test_tfidf_spark_fit_matches_driver_fit(spark):
    names = spark.createDataFrame([(c.upper(),) for c in CORPUS], ["name"])
    m_spark = TfidfModel.fit_spark(names)
    m_driver = TfidfModel.fit(sorted(CORPUS))
    assert m_spark.vocab == m_driver.vocab
    assert np.allclose(m_spark.idf, m_driver.idf)


def test_tfidf_spark_fit_extra_corpus(spark):
    names = spark.createDataFrame([("JOHN WICK",)], ["name"])
    m = TfidfModel.fit_spark(names, extra_corpus=["jane doe"])
    assert "wick" in m.vocab and "doe" in m.vocab


def test_gbm_learns_and_roundtrips():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(3000, 5))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(float)  # xor: needs depth
    model = GBMClassifier(n_estimators=120, max_depth=3, learning_rate=0.2).fit(X, y)
    acc = ((model.predict_proba(X) > 0.5) == y).mean()
    assert acc > 0.95
    m2 = GBMClassifier.from_json(model.to_json())
    assert np.allclose(m2.predict_proba(X), model.predict_proba(X))


def test_gbm_probability_monotone_feature():
    rng = np.random.default_rng(2)
    X = rng.uniform(size=(2000, 1))
    y = (X[:, 0] > 0.6).astype(float)
    model = GBMClassifier(n_estimators=50, max_depth=2).fit(X, y)
    p = model.predict_proba(np.array([[0.1], [0.9]]))
    assert p[0] < 0.2 and p[1] > 0.8
