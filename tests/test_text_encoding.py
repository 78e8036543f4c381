"""Encoding-hygiene ops: the mojibake repair table and its round-trip
property (the Spark/DuckDB expression parity is enforced by the oracle
gate — text_mojibake / text_nfc; these tests pin the table itself)."""

from pdf_ocr_spark.operators.text_analysis import MOJIBAKE_MAP, _as_mojibake


def _corrupt(s: str) -> str:
    for bad, good in reversed(MOJIBAKE_MAP):
        s = s.replace(good, bad)
    return s


def _repair(s: str) -> str:
    for bad, good in MOJIBAKE_MAP:
        s = s.replace(bad, good)
    return s


class TestMojibakeTable:
    def test_known_sequences(self):
        assert _as_mojibake("é") == "Ã©"
        assert _as_mojibake("’") == "â€™"
        assert _as_mojibake("—") == "â€”"

    def test_map_entries_unique_and_multichar(self):
        bads = [b for b, _ in MOJIBAKE_MAP]
        assert len(bads) == len(set(bads))
        assert all(len(b) >= 2 for b in bads)

    def test_roundtrip(self):
        s = "it’s café — “quoted” … naïve piñata garçon"
        corrupted = _corrupt(s)
        assert corrupted != s
        assert _repair(corrupted) == s

    def test_repair_is_noop_on_clean_ascii(self):
        s = "plain ascii text, nothing to fix."
        assert _repair(s) == s

    def test_real_world_sample(self):
        # the classic: UTF-8 bytes of a right single quote read as cp1252
        assert _repair("donâ€™t") == "don’t"
        assert _repair("cafÃ©") == "café"
