"""Unit vectors for the scalar library (FIXTURES.md §6 parity vectors)."""

from datetime import date, datetime

from horizon_etl_ray.functions import scalars as sc


def test_normalize_text():
    assert sc.normalize_text("  Ciência & Tecnologia!  ") == "ciencia tecnologia"
    assert sc.normalize_text(None) == ""
    assert sc.normalize_text("A--B__C") == "a b c"


def test_build_identity_key():
    assert sc.build_identity_key("SigPesq WorkPlan", "12345") == "sigpesq workplan|12345"
    assert sc.build_identity_key("", None, "x") == "x"


def test_normalize_code():
    assert sc.normalize_code(" PJ-0012/a") == "0012"
    assert sc.normalize_code("nope") == ""
    assert sc.normalize_code(None) == ""


def test_normalize_name_vectors():
    assert sc.normalize_name("Pãulo Sérgio Junior") == "PAULO SERGIO JUNIOR"
    assert sc.normalize_name("maria-luiza d'ávila") == "MARIA LUIZA D AVILA"


def test_canonicalize_name_particles():
    assert sc.canonicalize_name("JOÃO DE SOUZA DOS SANTOS") == "JOAO de SOUZA dos SANTOS"


def test_parse_date_formats():
    expect = date(2023, 5, 7)
    for s in ["07/05/2023", "2023-05-07", "07-05-2023", "2023/05/07", "07.05.2023"]:
        assert sc.parse_date(s) == expect, s
    assert sc.parse_date(datetime(2023, 5, 7, 12, 0)) == expect
    assert sc.parse_date("not a date") is None
    assert sc.parse_date(None) is None
    assert sc.parse_date(float("nan")) is None


def test_parse_currency():
    assert sc.parse_currency("1.234,56") == 1234.56
    assert sc.parse_currency("R$ 10,00") == 10.0
    assert sc.parse_currency("12.5") == 12.5
    assert sc.parse_currency("junk") == 0.0
    assert sc.parse_currency(None) == 0.0


def test_parse_truthy_ptbr():
    for v in ["sim", "Sim", "S", "true", "1", 1, True, "x"]:
        assert sc.parse_truthy(v) is True, v
    for v in ["nao", "não", "NO", "0", 0, False, "", None, "weird"]:
        assert sc.parse_truthy(v) is False, v


def test_parse_names():
    assert sc.parse_names("Ana; Bob ;; ; Célia") == ["Ana", "Bob", "Célia"]
    assert sc.parse_names(None) == []


def test_anonymize_idempotent():
    a = sc.anonymize_cpf("123.456.789-00")
    assert a.startswith("LGPD-") and len(a) == 21
    assert sc.anonymize_cpf(a) == a  # idempotent on replay
    e = sc.anonymize_email("User@Example.COM")
    assert e.endswith("@anon.lgpd")
    assert sc.anonymize_email(e) == e
    assert sc.anonymize_email("user@example.com") == e  # case-insensitive


def test_scrub_text_pii():
    out = sc.scrub_text_pii("contact a@b.com or c.d@e.org now")
    assert "a@b.com" not in out and "c.d@e.org" not in out
    assert out.count("@anon.lgpd") == 2


def test_stable_hash_sorted_keys():
    assert sc.stable_hash({"b": 1, "a": date(2020, 1, 2)}) == sc.stable_hash(
        {"a": date(2020, 1, 2), "b": 1}
    )


def test_sha256_hex():
    assert sc.sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert sc.sha256_hex(None) == ""
