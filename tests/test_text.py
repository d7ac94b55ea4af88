import numpy as np
import pandas as pd

from horizon_etl_ray.functions import text as tx


def test_token_counts_match_single_space_split():
    s = pd.Series(["a b  c", "", "one", None, "x y z w"])
    got = tx.count_tokens_whitespace(s)
    want = [len(("" if v is None else v).split(" ")) for v in s]
    assert list(got) == want


def test_bpeish_token_count():
    s = pd.Series(["hello, world!", "a.b.c"])
    assert list(tx.count_tokens_bpeish(s)) == [4, 5]  # hello , world ! | a . b . c


def test_quality_features_shapes_and_ranges():
    s = pd.Series(["the quick brown fox jumps over the lazy dog", "zzzz", ""])
    f = tx.quality_features(s)
    assert list(f.columns) == ["n_chars", "n_tokens", "mean_token_len",
                               "alpha_ratio", "stopword_ratio"]
    assert f["stopword_ratio"][0] > 0.2  # 'the' twice
    assert f["alpha_ratio"][1] == 1.0
    q = tx.quality_score(f)
    assert ((q >= 0) & (q <= 1)).all()


def test_lang_id_profiles():
    m = tx.LangIdModel()
    assert m.predict_one("the cat and the dog of a king") == "en"
    assert m.predict_one("el perro y la casa de los reyes") == "es"
    assert m.predict_one("le chat et le chien dans la maison") == "fr"
    assert m.predict_one("der Hund und die Katze mit dem Ball") == "de"
    assert m.predict_one("") == "und"
    assert m.predict_one("zzz qqq www") == "und"


def test_fingerprint_deterministic_and_edit_robust():
    t1 = "x" * 50 + "the quick brown fox jumps over the lazy dog" + "y" * 50
    assert tx.rolling_fingerprint(t1) == tx.rolling_fingerprint(t1)
    # local edit far from the selected windows usually keeps some overlap;
    # at minimum, identical docs match and tiny docs hash by sha1
    assert tx.rolling_fingerprint("ab") == tx.rolling_fingerprint("ab")
    assert tx.rolling_fingerprint("ab") != tx.rolling_fingerprint("ac")


def test_stages_smoke():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["the cat and the dog", "el perro y la casa"]})
    out = tx.LangIdStage()(df.copy())
    assert list(out["lang_pred"]) == ["en", "es"]
    out2 = tx.FingerprintStage()(df.copy())
    assert out2["fingerprint"].notna().all()
