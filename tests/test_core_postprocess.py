"""Validator truth tables ported from internal/core/postprocess_test.go:33-215."""

from ner_backend_spark.core.entity import create_entity
from ner_backend_spark.core.postprocess import (
    filter_entities,
    is_valid_card,
    is_valid_credit_score,
    is_valid_email,
    is_valid_phone,
    is_valid_ssn,
)


def test_phone_truth_table():
    assert is_valid_phone(b"123-4567")
    assert is_valid_phone(b"+1 800 555 1234 ext 567")
    assert not is_valid_phone(b"12345")  # too few digits
    assert not is_valid_phone(b"1" * 20)  # too many digits
    assert not is_valid_phone(b"ABC-DEF-GHIJ")


def test_card_truth_table():
    assert is_valid_card(b"4111 1111 1111 1111")  # Luhn-valid visa
    assert is_valid_card(b"5500-0000-0000-0004")
    assert not is_valid_card(b"4111 1111 1111 1112")  # Luhn fails
    assert not is_valid_card(b"1" * 11)  # too short
    assert not is_valid_card(b"1" * 20)  # too long


def test_ssn_truth_table():
    assert is_valid_ssn(b"123-45-6789")
    assert is_valid_ssn(b"123 45 6789")
    assert is_valid_ssn(b"123456789")
    assert not is_valid_ssn(b"123-45-678")
    assert not is_valid_ssn(b"1234-56-7890")
    assert not is_valid_ssn(b"12a-45-6789")


def test_email_truth_table():
    assert is_valid_email("john.doe@example.com")
    assert is_valid_email("user@localhost")
    assert not is_valid_email("a@b.com")  # local too short
    assert not is_valid_email("ab@c")  # domain too short
    assert not is_valid_email("ab@domaincom")  # no dot


def test_credit_score_truth_table():
    full = b"my credit score is 750 today"
    start = full.index(b"750")
    assert is_valid_credit_score(b"750", full, start, start + 3)

    # missing the "score" keyword nearby
    full2 = b"my credit rating is 750 today"
    start2 = full2.index(b"750")
    assert not is_valid_credit_score(b"750", full2, start2, start2 + 3)

    # 1-digit and 4-digit scores rejected by the \b[0-9]{2,3}\b regex
    assert not is_valid_credit_score(b"7", full, start, start + 1)
    assert not is_valid_credit_score(b"7500", full, start, start + 4)


def test_unknown_labels_pass_through():
    text = b"hello NAME world"
    ents = [create_entity("NAME", text, 6, 10)]
    assert filter_entities(text, ents) == ents


def test_merge_adjacent_phone_runs():
    # Two adjacent PHONENUMBER spans (gap 1) that only validate when merged.
    text = b"call 123-456 7890 now"
    e1 = create_entity("PHONENUMBER", text, 5, 12)  # "123-456"
    e2 = create_entity("PHONENUMBER", text, 13, 17)  # "7890"
    out = filter_entities(text, [e1, e2])
    assert out == [e1, e2]  # the run validates merged (10 digits)

    # Same spans but far apart: each alone has <7 digits -> both dropped.
    text2 = b"call 123-456 xx 7890"
    f1 = create_entity("PHONENUMBER", text2, 5, 12)
    f2 = create_entity("PHONENUMBER", text2, 16, 20)
    assert filter_entities(text2, [f1, f2]) == []


def test_non_adjacent_breaks_run():
    # run breaks at gap>1; first group "123456789012" validates as card
    text = b"4111111111111111   41111111111111"
    e1 = create_entity("CARD_NUMBER", text, 0, 16)
    e2 = create_entity("CARD_NUMBER", text, 19, 33)
    out = filter_entities(text, [e1, e2])
    # e1 Luhn-valid alone; e2 (41111111111111) is 14 digits, Luhn-invalid
    assert out == [e1]
