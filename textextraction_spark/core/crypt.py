"""F9 — deterministic AES-256-CBC field encryption (SURVEY.md §2.8 F9).

The reference optionally AES-encrypts PHI fields (patient name / DOB) when
``EnableEncryption`` is set (``Worker.cs:238-250``, ``CryptLib.cs:82-125``)
with two determinism quirks we reproduce for byte-parity:

- key = SHA-256("CHILDPASS") hex string TRUNCATED TO 31 CHARS + NUL padding
  (``CryptLib.cs:140, 195-209`` — 31 hex chars of the digest, not 32 bytes);
- IV  = a FIXED 16-byte array (``CryptLib.cs:25``; the random IV generated
  at ``:139`` is ignored by encryptDecrypt, which copies ``m_DesIV`` at
  ``:108``), PKCS7 padding, Base64 output.

Fixed-IV CBC is NOT semantically secure — this exists only to mirror the
reference's deterministic output (SURVEY.md §7.4.5) and is flag-gated off
by default.  The AES primitive below is a compact from-the-spec (FIPS-197)
table implementation — no external crypto dependency exists in this image.

We pin OUR parameters (our own fixed IV and exact key bytes documented
here) rather than byte-matching a .NET artifact we cannot run; goldens in
tests freeze the behavior.
"""

from __future__ import annotations

import base64
import hashlib

# --- AES-256 primitive (FIPS-197), encrypt-only ---------------------------

_SBOX = None


def _build_sbox() -> bytes:
    p = q = 1
    sbox = bytearray(256)
    sbox[0] = 0x63
    while True:
        # multiply p by 3 in GF(2^8)
        p = p ^ ((p << 1) & 0xFF) ^ (0x1B if p & 0x80 else 0)
        # divide q by 3
        q ^= (q << 1) & 0xFF
        q ^= (q << 2) & 0xFF
        q ^= (q << 4) & 0xFF
        if q & 0x80:
            q ^= 0x09
        x = q ^ ((q << 1) | (q >> 7)) ^ ((q << 2) | (q >> 6)) ^ (
            (q << 3) | (q >> 5)
        ) ^ ((q << 4) | (q >> 4))
        sbox[p] = (x ^ 0x63) & 0xFF
        if p == 1:
            break
    return bytes(sbox)


def _sbox() -> bytes:
    global _SBOX
    if _SBOX is None:
        _SBOX = _build_sbox()
    return _SBOX


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _expand_key(key: bytes) -> list[bytes]:
    sbox = _sbox()
    nk, nr = 8, 14  # AES-256
    w = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = bytearray(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = bytearray(sbox[b] for b in t)
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif i % nk == 4:
            t = bytearray(sbox[b] for b in t)
        w.append(bytes(a ^ b for a, b in zip(w[i - nk], t)))
    return [b"".join(w[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(block: bytes, round_keys: list[bytes]) -> bytes:
    sbox = _sbox()
    s = bytearray(a ^ b for a, b in zip(block, round_keys[0]))
    for rnd in range(1, 15):
        s = bytearray(sbox[b] for b in s)  # SubBytes
        # ShiftRows (state is column-major: s[c*4+r])
        s = bytearray(s[(((i // 4) + (i % 4)) % 4) * 4 + (i % 4)] for i in range(16))
        if rnd != 14:  # MixColumns
            m = bytearray(16)
            for c in range(4):
                a = s[4 * c : 4 * c + 4]
                t = a[0] ^ a[1] ^ a[2] ^ a[3]
                for r in range(4):
                    m[4 * c + r] = a[r] ^ t ^ _xtime(a[r] ^ a[(r + 1) % 4])
            s = m
        s = bytearray(a ^ b for a, b in zip(s, round_keys[rnd]))
    return bytes(s)


# --- reference-shaped key/IV (see module doc) ------------------------------

FIXED_IV = bytes(range(16))  # our pinned fixed IV (the determinism quirk)


def derive_key(passphrase: str = "CHILDPASS") -> bytes:
    """31 hex chars of sha256(passphrase) + NUL, mirroring the truncation
    quirk at ``CryptLib.cs:195-209`` (31-char key zero-padded to 32)."""
    return (hashlib.sha256(passphrase.encode()).hexdigest()[:31] + "\x00").encode()


def encrypt_field(plaintext: str, passphrase: str = "CHILDPASS") -> str:
    """AES-256-CBC(fixed IV) + PKCS7 -> Base64, deterministic per input."""
    data = plaintext.encode("utf-8")
    pad = 16 - (len(data) % 16)
    data += bytes([pad]) * pad
    rks = _expand_key(derive_key(passphrase))
    out = bytearray()
    prev = FIXED_IV
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return base64.b64encode(bytes(out)).decode("ascii")
