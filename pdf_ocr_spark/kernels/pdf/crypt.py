"""Standard security handler: empty-user-password decryption for
encrypted crawl PDFs (PDF 32000-1 §7.6).

Most "encrypted" web PDFs are owner-password-only (printing/copy
restrictions): the user password is EMPTY, so the file key derives from
the padding constant alone and the document decrypts losslessly.  This
module implements exactly that recovery path:

  * R2 (RC4-40), R3 (RC4-128), R4 (/CFM /V2 RC4 or /AESV2 AES-128-CBC)
    — Algorithms 2/4/5 key derivation + per-object rekey (§7.6.2-3)
  * R5/R6 (/AESV3 AES-256-CBC) — SHA-256 validation (Algorithm 2.A/2.B)
    with the file key unwrapped from /UE
  * wrong / non-empty user passwords still surface as the typed
    ``pdf_encrypted`` failure (PDFEncryptedError)

RC4 and AES are implemented inline in pure python (FIPS-197 tables):
the sandbox has no crypto package, and these only ever run on the small
fraction of crawl docs that are encrypted — never the hot path.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Any, Dict, Optional

from pdf_ocr_spark.kernels.pdf.cos import Name, PDFError


class PDFEncryptedError(PDFError):
    """Encryption present but not recoverable (unsupported handler or a
    real — non-empty — user password)."""


# §7.6.3.3 padding string (Algorithm 2 step a)
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: same op encrypts and decrypts)."""
    S = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# -- AES (FIPS-197), pure python ---------------------------------------------

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL = [[0] * 256 for _ in range(16)]
for _c in range(256):
    acc = {1: _c}
    x = _c
    for _p in (2, 4, 8):
        x = _xtime(x)
        acc[_p] = x
    for _f in (2, 3, 9, 11, 13, 14):
        v = 0
        for _bit in (1, 2, 4, 8):
            if _f & _bit:
                v ^= acc[_bit]
        _MUL[_f][_c] = v


def _expand_key(key: bytes) -> list:
    nk = len(key) // 4
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # group into round keys of 16 bytes
    return [
        bytes(sum((words[4 * r + c] for c in range(4)), []))
        for r in range(nr + 1)
    ]


def _encrypt_block(rk: list, block: bytes) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * c + r] = _SBOX[s[4 * ((c + r) % 4) + r]]
        # MixColumns + AddRoundKey
        k = rk[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
            s[4 * c + 0] = _MUL[2][a0] ^ _MUL[3][a1] ^ a2 ^ a3 ^ k[4 * c + 0]
            s[4 * c + 1] = a0 ^ _MUL[2][a1] ^ _MUL[3][a2] ^ a3 ^ k[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _MUL[2][a2] ^ _MUL[3][a3] ^ k[4 * c + 2]
            s[4 * c + 3] = _MUL[3][a0] ^ a1 ^ a2 ^ _MUL[2][a3] ^ k[4 * c + 3]
    t = bytearray(16)
    for c in range(4):
        for r in range(4):
            t[4 * c + r] = _SBOX[s[4 * ((c + r) % 4) + r]]
    return bytes(a ^ b for a, b in zip(t, rk[nr]))


def _decrypt_block(rk: list, block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[4 * ((c + r) % 4) + r] = _INV_SBOX[s[4 * c + r]]
        # AddRoundKey + InvMixColumns
        k = rk[rnd]
        x = bytearray(a ^ b for a, b in zip(t, k))
        for c in range(4):
            a0, a1, a2, a3 = x[4 * c : 4 * c + 4]
            s[4 * c + 0] = _MUL[14][a0] ^ _MUL[11][a1] ^ _MUL[13][a2] ^ _MUL[9][a3]
            s[4 * c + 1] = _MUL[9][a0] ^ _MUL[14][a1] ^ _MUL[11][a2] ^ _MUL[13][a3]
            s[4 * c + 2] = _MUL[13][a0] ^ _MUL[9][a1] ^ _MUL[14][a2] ^ _MUL[11][a3]
            s[4 * c + 3] = _MUL[11][a0] ^ _MUL[13][a1] ^ _MUL[9][a2] ^ _MUL[14][a3]
    t = bytearray(16)
    for c in range(4):
        for r in range(4):
            t[4 * ((c + r) % 4) + r] = _INV_SBOX[s[4 * c + r]]
    return bytes(a ^ b for a, b in zip(t, rk[0]))


def aes_cbc_decrypt(key: bytes, iv_and_ct: bytes, unpad: bool = True) -> bytes:
    """AES-CBC: input is IV ‖ ciphertext (the PDF string/stream layout,
    §7.6.2); strips PKCS#7 padding unless ``unpad=False``."""
    if len(iv_and_ct) < 16:
        return b""
    rk = _expand_key(key)
    iv, ct = iv_and_ct[:16], iv_and_ct[16:]
    ct = ct[: len(ct) - len(ct) % 16]
    out = bytearray()
    prev = iv
    for i in range(0, len(ct), 16):
        blk = ct[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, blk), prev))
        prev = blk
    if unpad and out:
        n = out[-1]
        if 1 <= n <= 16:
            out = out[:-n]
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, pt: bytes, pad: bool = True) -> bytes:
    """Forward CBC (fixture generation / Algorithm 2.B); returns IV ‖ ct
    when padding, bare ct when ``pad=False`` (2.B uses no padding/IV)."""
    rk = _expand_key(key)
    if pad:
        n = 16 - len(pt) % 16
        pt = pt + bytes([n]) * n
    out = bytearray()
    prev = iv
    for i in range(0, len(pt), 16):
        blk = bytes(a ^ b for a, b in zip(pt[i : i + 16], prev))
        prev = _encrypt_block(rk, blk)
        out += prev
    return (iv + bytes(out)) if pad else bytes(out)


def _as_bytes(v: Any) -> bytes:
    if isinstance(v, bytes):
        return v
    if isinstance(v, str):
        return v.encode("latin-1", "replace")
    return b""


def compute_file_key_rc4(
    owner_entry: bytes,
    perms: int,
    id0: bytes,
    revision: int,
    key_len: int,
    encrypt_metadata: bool = True,
    user_password: bytes = b"",
) -> bytes:
    """Algorithm 2: password → file encryption key."""
    h = hashlib.md5()
    h.update((user_password + PAD)[:32])
    h.update(owner_entry[:32])
    # /P is SIGNED in the spec but many producers write the unsigned
    # 32-bit form (e.g. 4294963392 for -3904); mask to the same 4 bytes
    h.update(struct.pack("<I", perms & 0xFFFFFFFF))
    h.update(id0)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_len]).digest()
    return key[:key_len]


def expected_user_entry(key: bytes, id0: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R≥3): the /U value for a given file key."""
    if revision == 2:
        return rc4(key, PAD)
    h = hashlib.md5(PAD + id0).digest()
    u = rc4(key, h)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u  # first 16 bytes are significant


def _hash_r6(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B (R6 iterated hash; R5 is plain SHA-256)."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1, pad=False)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


class StandardSecurityHandler:
    """Empty-user-password decryptor for the /Filter /Standard handler.

    Raises :class:`PDFEncryptedError` when the document needs a real
    password or uses an unsupported scheme — the caller surfaces that as
    the typed ``pdf_encrypted`` failure."""

    def __init__(self, enc: Dict[str, Any], id0: bytes):
        filt = enc.get("Filter")
        if filt is not None and str(filt) != "Standard":
            raise PDFEncryptedError(f"unsupported security handler: {filt}")
        self.v = int(enc.get("V", 0))
        self.r = int(enc.get("R", 2))
        self.key_len = int(enc.get("Length", 40)) // 8 or 5
        o = _as_bytes(enc.get("O"))
        u = _as_bytes(enc.get("U"))
        self.perms = int(enc.get("P", -1))
        em = enc.get("EncryptMetadata")
        self.encrypt_metadata = True if em is None else bool(em)
        # crypt-filter method for V4/V5: 'rc4' | 'aes' | 'identity'
        self.method = "rc4"
        self.str_method = self.stm_method = None

        if self.v in (4, 5):
            cf = enc.get("CF") or {}
            stmf = str(enc.get("StmF", Name("Identity")))
            strf = str(enc.get("StrF", Name("Identity")))

            def cfm_of(name: str) -> str:
                if name == "Identity":
                    return "identity"
                d = cf.get(name)
                m = str((d or {}).get("CFM", "None"))
                # per-crypt-filter /Length (Table 25) — some producers put
                # it ONLY here; writers disagree on bytes vs bits, so
                # treat values ≥ 40 as bits (16 → 16 bytes, 128 → 16)
                cl = (d or {}).get("Length")
                if isinstance(cl, (int, float)) and cl > 0:
                    self.key_len = int(cl) // 8 if cl >= 40 else int(cl)
                if m == "V2":
                    return "rc4"
                if m in ("AESV2", "AESV3"):
                    return "aes"
                if m == "None":
                    return "identity"
                raise PDFEncryptedError(f"unsupported crypt filter method: {m}")

            self.stm_method = cfm_of(stmf)
            self.str_method = cfm_of(strf)
            if self.v == 4:
                # AESV2 key length is 16 regardless of a sloppy /Length
                if "aes" in (self.stm_method, self.str_method):
                    self.key_len = 16
        elif self.v == 2:
            pass  # RC4, keyed by /Length
        elif self.v == 1:
            self.key_len = 5
        else:
            raise PDFEncryptedError(f"unsupported /V {self.v}")

        if self.r in (2, 3, 4):
            self.key = compute_file_key_rc4(
                o, self.perms, id0, self.r, self.key_len, self.encrypt_metadata
            )
            want = expected_user_entry(self.key, id0, self.r)
            got = u
            if self.r == 2:
                ok = want == got[:32]
            else:
                ok = want[:16] == got[:16]
            if not ok:
                raise PDFEncryptedError("user password required")
        elif self.r in (5, 6):
            # Algorithm 2.A with the EMPTY user password
            vsalt, ksalt = u[32:40], u[40:48]
            if self.r == 5:
                hval = hashlib.sha256(b"" + vsalt).digest()
                ikey = hashlib.sha256(b"" + ksalt).digest()
            else:
                hval = _hash_r6(b"", vsalt, b"")
                ikey = _hash_r6(b"", ksalt, b"")
            if hval != u[:32]:
                raise PDFEncryptedError("user password required")
            ue = _as_bytes(enc.get("UE"))
            if len(ue) < 32:
                raise PDFEncryptedError("missing /UE")
            self.key = aes_cbc_decrypt(ikey, b"\x00" * 16 + ue, unpad=False)[:32]
        else:
            raise PDFEncryptedError(f"unsupported /R {self.r}")

    # -- per-object decryption --------------------------------------------

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        if self.r >= 5:
            return self.key  # AESV3: the file key is used directly
        h = hashlib.md5()
        h.update(self.key)
        h.update(struct.pack("<i", num)[:3])
        h.update(struct.pack("<i", gen)[:2])
        if aes:
            h.update(b"sAlT")
        return h.digest()[: min(self.key_len + 5, 16)]

    def _decrypt(self, data: bytes, num: int, gen: int, method: str) -> bytes:
        if method == "identity" or not data:
            return data
        if method == "aes":
            return aes_cbc_decrypt(self._object_key(num, gen, True), data)
        return rc4(self._object_key(num, gen, False), data)

    def _default_method(self) -> str:
        return "aes" if self.r >= 5 else "rc4"

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        m = self.str_method if self.str_method is not None else self._default_method()
        return self._decrypt(data, num, gen, m)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        m = self.stm_method if self.stm_method is not None else self._default_method()
        return self._decrypt(data, num, gen, m)
