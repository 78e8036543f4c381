"""Encrypted-PDF recovery tests: AES/RC4 primitives against published
test vectors, then end-to-end decryption of hand-built encrypted fixtures
(the inverse algorithms live HERE, so the kernel is verified against an
independent construction): RC4-40 (R2), RC4-128 (R3), AES-128 /AESV2
(R4), AES-256 /AESV3 (R6), and the wrong-password refusal."""

import hashlib
import struct

from pdf_ocr_spark.kernels.pdf.crypt import (
    PAD,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    _encrypt_block,
    _decrypt_block,
    _expand_key,
    _hash_r6,
    compute_file_key_rc4,
    expected_user_entry,
    rc4,
)
from pdf_ocr_spark.kernels.pdf.extract import extract_pdf


class TestPrimitives:
    def test_aes128_fips197_vector(self):
        key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
        rk = _expand_key(key)
        assert _encrypt_block(rk, pt) == ct
        assert _decrypt_block(rk, ct) == pt

    def test_aes256_fips197_vector(self):
        key = bytes.fromhex(
            "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
        )
        pt = bytes.fromhex("00112233445566778899aabbccddeeff")
        ct = bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")
        rk = _expand_key(key)
        assert _encrypt_block(rk, pt) == ct
        assert _decrypt_block(rk, ct) == pt

    def test_cbc_roundtrip_with_padding(self):
        key = b"0123456789abcdef"
        iv = b"\x11" * 16
        for n in (0, 1, 15, 16, 17, 100):
            pt = bytes(range(256))[:n]
            assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, pt)) == pt

    def test_rc4_known_vector(self):
        # classic published vector: RC4("Key", "Plaintext")
        assert rc4(b"Key", b"Plaintext") == bytes.fromhex("bbf316e8d940af0ad3")
        assert rc4(b"Key", rc4(b"Key", b"payload")) == b"payload"


# -- fixture construction (the ENCRYPTION side, independent of crypt.py) -----

ID0 = bytes.fromhex("0123456789abcdef0123456789abcdef")


def _compute_O(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3: the /O entry."""
    h = hashlib.md5((owner_pw + PAD)[:32]).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h).digest()
    key = h[:n]
    o = rc4(key, (user_pw + PAD)[:32])
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _object_key(file_key: bytes, num: int, gen: int, n: int, aes: bool) -> bytes:
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<i", num)[:3])
    h.update(struct.pack("<i", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(n + 5, 16)]


def _hexstr(b: bytes) -> bytes:
    return b"<" + b.hex().encode() + b">"


CONTENT = b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Secret text) Tj ET"
TITLE = b"Confidential title"


def _build_pdf(enc_dict: bytes, enc_stream, enc_string) -> bytes:
    """Minimal 7-object PDF with an encrypted content stream and an
    encrypted /Info /Title string."""
    body = enc_stream(CONTENT, 4, 0)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(body), body),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        enc_dict,
        b"<< /Title %s >>" % _hexstr(enc_string(TITLE, 7, 0)),
    ]
    out = bytearray(b"%PDF-1.6\n")
    offsets = []
    for i, b in enumerate(objs, 1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, b)
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R /Encrypt 6 0 R /Info 7 0 R"
        b" /ID [%s %s] >>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, _hexstr(ID0), _hexstr(ID0), xref)
    )
    return bytes(out)


def _rc4_pdf(
    r: int = 3,
    keybits: int = 128,
    user_pw: bytes = b"",
    unsigned_p: bool = False,
    cf_length_only: bool = False,
) -> bytes:
    n = keybits // 8
    o = _compute_O(b"ownersecret", user_pw, r, n)
    perms = -44
    key = compute_file_key_rc4(o, perms, ID0, r, n, user_password=user_pw)
    u = expected_user_entry(key, ID0, r)
    if r >= 3:
        u = u + b"\x00" * 16  # 16 significant + 16 arbitrary bytes
    # some producers write /P as the unsigned 32-bit form
    p_written = (perms & 0xFFFFFFFF) if unsigned_p else perms
    if cf_length_only:
        # V4 layout where ONLY the crypt filter dict carries /Length
        enc_dict = (
            b"<< /Filter /Standard /V 4 /R 4 /P %d /O %s /U %s"
            b" /CF << /StdCF << /CFM /V2 /Length %d >> >>"
            b" /StmF /StdCF /StrF /StdCF >>"
            % (p_written, _hexstr(o), _hexstr(u), keybits)
        )
    else:
        v = 1 if r == 2 else 2
        enc_dict = (
            b"<< /Filter /Standard /V %d /R %d /Length %d /P %d /O %s /U %s >>"
            % (v, r, keybits, p_written, _hexstr(o), _hexstr(u))
        )

    def enc(data, num, gen):
        return rc4(_object_key(key, num, gen, n, False), data)

    return _build_pdf(enc_dict, enc, enc)


def _aesv2_pdf() -> bytes:
    n = 16
    o = _compute_O(b"ownersecret", b"", 4, n)
    perms = -44
    key = compute_file_key_rc4(o, perms, ID0, 4, n)
    u = expected_user_entry(key, ID0, 4) + b"\x00" * 16
    enc_dict = (
        b"<< /Filter /Standard /V 4 /R 4 /Length 128 /P %d /O %s /U %s"
        b" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
        b" /StmF /StdCF /StrF /StdCF >>" % (perms, _hexstr(o), _hexstr(u))
    )

    def enc(data, num, gen):
        iv = hashlib.md5(data + bytes([num, gen])).digest()  # deterministic IV
        return aes_cbc_encrypt(_object_key(key, num, gen, n, True), iv, data)

    return _build_pdf(enc_dict, enc, enc)


def _aesv3_pdf() -> bytes:
    file_key = hashlib.sha256(b"fixture-file-key").digest()  # 32 bytes
    vsalt, ksalt = b"VALSALT!", b"KEYSALT!"
    u = _hash_r6(b"", vsalt, b"") + vsalt + ksalt
    ikey = _hash_r6(b"", ksalt, b"")
    ue = aes_cbc_encrypt(ikey, b"\x00" * 16, file_key, pad=False)
    enc_dict = (
        b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -44"
        b" /O %s /OE %s /U %s /UE %s"
        b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
        b" /StmF /StdCF /StrF /StdCF >>"
        % (_hexstr(b"\x00" * 48), _hexstr(b"\x00" * 32), _hexstr(u), _hexstr(ue))
    )

    def enc(data, num, gen):
        iv = hashlib.md5(data + bytes([num, gen])).digest()
        return aes_cbc_encrypt(file_key, iv, data)

    return _build_pdf(enc_dict, enc, enc)


class TestEncryptedPdf:
    def _assert_recovered(self, pdf: bytes):
        from pdf_ocr_spark.kernels.pdf.cos import PDFDocument

        res = extract_pdf(pdf)
        assert res.status == "ok", res.failure_reason
        assert res.pages[0].text == "Secret text"
        doc = PDFDocument(pdf)
        info = doc.resolve(doc.trailer["Info"])
        assert info["Title"] == TITLE  # string decryption

    def test_rc4_40_r2(self):
        self._assert_recovered(_rc4_pdf(r=2, keybits=40))

    def test_rc4_128_r3(self):
        self._assert_recovered(_rc4_pdf(r=3, keybits=128))

    def test_aes128_v4(self):
        self._assert_recovered(_aesv2_pdf())

    def test_aes256_v5_r6(self):
        self._assert_recovered(_aesv3_pdf())

    def test_unsigned_p_value_recovered(self):
        """Many producers write /P as the unsigned 32-bit form
        (4294967252 instead of -44); key derivation must mask, not
        crash on struct.pack('<i', ...)."""
        self._assert_recovered(_rc4_pdf(r=3, keybits=128, unsigned_p=True))

    def test_v4_crypt_filter_length_only(self):
        """V4 layout where the key length lives ONLY in the crypt-filter
        dict (/CF /StdCF /Length, per Table 25) — an RC4-128 file must
        not fall back to the 40-bit default and refuse its own key."""
        self._assert_recovered(_rc4_pdf(r=4, keybits=128, cf_length_only=True))

    def test_real_user_password_refused(self):
        res = extract_pdf(_rc4_pdf(r=3, keybits=128, user_pw=b"letmein"))
        assert res.status == "failed"
        assert res.failure_reason == "pdf_encrypted"

    def test_unsupported_handler_refused(self):
        pdf = _rc4_pdf()
        res = extract_pdf(pdf.replace(b"/Filter /Standard", b"/Filter /Custom1"))
        assert res.status == "failed"
        assert res.failure_reason == "pdf_encrypted"


class TestPrimitiveProperties:
    """Property tests: the pure-python primitives roundtrip for arbitrary
    keys and payloads (beyond the fixed FIPS vectors)."""

    def test_aes_cbc_roundtrip_random(self):
        import hashlib

        for seed in range(40):
            key = hashlib.sha256(b"k%d" % seed).digest()[: 16 if seed % 2 else 32]
            iv = hashlib.md5(b"iv%d" % seed).digest()
            pt = hashlib.sha512(b"p%d" % seed).digest()[: seed % 65]
            assert aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, pt)) == pt

    def test_rc4_roundtrip_random(self):
        import hashlib

        for seed in range(40):
            key = hashlib.md5(b"k%d" % seed).digest()[: 5 + seed % 12]
            data = hashlib.sha512(b"d%d" % seed).digest()[: 1 + seed % 63]
            assert rc4(key, rc4(key, data)) == data

    def test_object_keys_differ_per_object(self):
        from pdf_ocr_spark.kernels.pdf.crypt import StandardSecurityHandler

        pdf_like = {"V": 2, "R": 3, "Length": 128, "P": -44,
                    "O": _compute_O(b"own", b"", 3, 16)}
        key = compute_file_key_rc4(pdf_like["O"], -44, ID0, 3, 16)
        pdf_like["U"] = expected_user_entry(key, ID0, 3) + b"\x00" * 16
        h = StandardSecurityHandler(pdf_like, ID0)
        k1 = h._object_key(4, 0, False)
        k2 = h._object_key(5, 0, False)
        assert k1 != k2 and len(k1) == 16
