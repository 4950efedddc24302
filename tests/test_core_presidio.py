"""Presidio golden-paragraph test ported from internal/core/presidio_test.go:21-54."""

from ner_backend_spark.core.models import PresidioModel

PARAGRAPH = (
    "The story of Leo Morgan fitness journey began in Boston witnessed by "
    "their national ID 789-67-4567 and visa permit 56482937 Their tranquil "
    "abode at 0899 Mark Centers Anthonyfurt, NE 61628 masked the suspense of "
    "their mother's maiden name, Russell Drop an email to sonia41@example.net "
    "for more."
)


def test_presidio_golden_paragraph():
    model = PresidioModel()
    entities = model.predict(PARAGRAPH.encode("utf-8"))
    by_key = {(e.label, e.start, e.end): e for e in entities}

    ssn = by_key[("SSN", 87, 98)]
    assert ssn.text == "789-67-4567"
    assert ssn.l_context == "y their national ID "
    assert ssn.r_context == " and visa permit 564"

    email = by_key[("EMAIL", 264, 283)]
    assert email.text == "sonia41@example.net"

    url = by_key[("URL", 272, 283)]
    assert url.text == "example.net"


def test_presidio_threshold_excludes_weak_patterns():
    # CreditCardRecognizer's only pattern scores 0.3 < threshold 0.5, so a
    # Luhn-valid card number must NOT be emitted as CARD_NUMBER.
    model = PresidioModel()
    entities = model.predict(b"my card is 4111 1111 1111 1111 ok")
    assert all(e.label != "CARD_NUMBER" for e in entities)


def test_presidio_tags():
    model = PresidioModel()
    tags = model.get_tags()
    assert set(tags) == {"CARD_NUMBER", "ID_NUMBER", "EMAIL", "VIN", "URL", "DATE", "SSN"}


def test_presidio_dedup_within_recognizer():
    # Two date patterns can match the same span; only one entity results.
    model = PresidioModel()
    ents = [e for e in model.predict(b"on 11/12/2020 we met") if e.label == "DATE"]
    assert len(ents) == 1
    assert ents[0].text == "11/12/2020"


def test_presidio_vehicle_validator_applies():
    model = PresidioModel()
    # matches \b\d{2}[A-FH-KPRX]\d{6}[A-Z]\b but starts with 00 -> rejected
    assert not [e for e in model.predict(b"id 00A123456Z here") if e.label == "VIN"]
    assert [e for e in model.predict(b"id 12A123456Z here") if e.label == "VIN"]
