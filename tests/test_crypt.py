"""F9 fixed-IV AES tests: FIPS-197 known-answer, determinism, golden
freeze, and the kernel's encrypt_phi flag."""

from __future__ import annotations

from textextraction_spark.core.crypt import (
    _encrypt_block,
    _expand_key,
    derive_key,
    encrypt_field,
)
from textextraction_spark.core.extract import extract_document


class TestAesCore:
    def test_fips197_c3_known_answer(self):
        key = bytes(range(32))
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        assert (
            _encrypt_block(pt, _expand_key(key)).hex()
            == "8ea2b7ca516745bfeafc49904b496089"
        )

    def test_key_truncation_quirk(self):
        k = derive_key()
        assert len(k) == 32 and k.endswith(b"\x00")

    def test_deterministic_and_sensitive(self):
        assert encrypt_field("JAMES SMITH") == encrypt_field("JAMES SMITH")
        assert encrypt_field("JAMES SMITH") != encrypt_field("JAMES SMITh")

    def test_golden_frozen(self):
        """Freeze the ciphertext bytes — any change to key/IV/padding is a
        breaking change to stored data."""
        assert encrypt_field("JAMES SMITH") == "9HWBNIfvh/AAfwbCQFRFaw=="
        assert encrypt_field("01/02/1980") == "JE1dF/4inFyVzPws7W8z+A=="

    def test_multi_block(self):
        long = "A" * 40  # 3 AES blocks with PKCS7
        ct = encrypt_field(long)
        assert encrypt_field(long) == ct and len(ct) > 40


class TestKernelFlag:
    HTML = b"<p>Patient Name: JAMES SMITH</p><p>DOB 01/02/1980</p><p>TOTAL $5.00</p>"

    def test_phi_encrypted_only(self):
        r = extract_document(self.HTML, encrypt_phi=True)
        spans = {s.field: s.text for s in r.spans}
        assert spans["patient.name"] == "9HWBNIfvh/AAfwbCQFRFaw=="
        assert spans["patient.birth_date"] == "JE1dF/4inFyVzPws7W8z+A=="
        assert spans["invoice.total"] == "$5.00"  # non-PHI untouched
        # extracted_text itself is NOT encrypted (matches reference: only
        # field values are, Worker.cs:242-249)
        assert "JAMES SMITH" in r.extracted_text

    def test_default_off(self):
        r = extract_document(self.HTML)
        assert {s.field: s.text for s in r.spans}["patient.name"] == "JAMES SMITH"
