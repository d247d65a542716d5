"""Google service-account authentication with the standard library:
the OAuth 2.0 JWT-bearer grant (RFC 7523) that google-auth performs,
re-implemented from the public specs so private GCS buckets work
without any SDK.

Pieces (all public):
* PEM/DER parsing of the service-account ``private_key`` — PKCS#8
  (RFC 5958) wrapping a PKCS#1 ``RSAPrivateKey`` (RFC 8017 A.1.2);
  bare PKCS#1 PEMs are accepted too.
* RS256 = RSASSA-PKCS1-v1_5 with SHA-256 (RFC 8017 §8.2, RFC 7518
  §3.3): EMSA padding with the SHA-256 DigestInfo prefix, then
  ``pow(m, d, n)``.
* The signed JWT (RFC 7515 compact serialization) is POSTed to the
  key file's ``token_uri`` with
  ``grant_type=urn:ietf:params:oauth:grant-type:jwt-bearer``; the
  returned ``access_token`` goes out as ``Authorization: Bearer``.

Reference parity: the reference delegates remote IO to fsspec/gcsfs,
which runs this exact flow through google-auth
(_io/io_zarr.py:125-168).  Credential objects here are small picklable
value holders so executors mint/refresh tokens themselves — no driver
round-trip per chunk at cluster scale (tokens are cached per process
and refreshed 60 s before expiry).
"""

from __future__ import annotations

import base64
import hashlib
import json
import time
import urllib.parse
import urllib.request

__all__ = ["ServiceAccountCredentials", "rsa_sha256_sign", "rsa_sha256_verify"]

# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_PREFIX = bytes.fromhex("3031300d060960864801650304020105000420")

GCS_READ_SCOPE = "https://www.googleapis.com/auth/devstorage.read_only"
GCS_RW_SCOPE = "https://www.googleapis.com/auth/devstorage.read_write"


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


# ---------------------------------------------------------------------------
# minimal DER / PEM
# ---------------------------------------------------------------------------


def _der_tlv(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV: returns (tag, value bytes, next position)."""
    tag = buf[pos]
    length = buf[pos + 1]
    pos += 2
    if length & 0x80:
        nbytes = length & 0x7F
        length = int.from_bytes(buf[pos : pos + nbytes], "big")
        pos += nbytes
    return tag, bytes(buf[pos : pos + length]), pos + length


def _der_children(value: bytes) -> list[tuple[int, bytes]]:
    out, pos = [], 0
    while pos < len(value):
        tag, v, pos = _der_tlv(value, pos)
        out.append((tag, v))
    return out


def _parse_pkcs1(der: bytes) -> dict[str, int]:
    tag, body, _ = _der_tlv(der, 0)
    if tag != 0x30:
        raise ValueError("RSA key: expected SEQUENCE")
    ints = [int.from_bytes(v, "big") for t, v in _der_children(body) if t == 0x02]
    if len(ints) < 6:
        raise ValueError("RSA key: truncated RSAPrivateKey")
    # version, n, e, d, p, q, dP, dQ, qInv
    return {"n": ints[1], "e": ints[2], "d": ints[3]}


def parse_private_key_pem(pem: str) -> dict[str, int]:
    """Extract ``{n, e, d}`` from a PKCS#8 or PKCS#1 RSA private key PEM."""
    lines = [l.strip() for l in pem.strip().splitlines()]
    body = "".join(l for l in lines if l and not l.startswith("-----"))
    der = base64.b64decode(body)
    if "BEGIN RSA PRIVATE KEY" in pem:
        return _parse_pkcs1(der)
    # PKCS#8: SEQUENCE { version, AlgorithmIdentifier, OCTET STRING key }
    tag, top, _ = _der_tlv(der, 0)
    if tag != 0x30:
        raise ValueError("PKCS#8 key: expected SEQUENCE")
    kids = _der_children(top)
    octets = [v for t, v in kids if t == 0x04]
    if not octets:
        raise ValueError("PKCS#8 key: no privateKey OCTET STRING")
    return _parse_pkcs1(octets[0])


# ---------------------------------------------------------------------------
# RSASSA-PKCS1-v1_5 / SHA-256
# ---------------------------------------------------------------------------


def _emsa_encode(message: bytes, em_len: int) -> bytes:
    digest = hashlib.sha256(message).digest()
    t = _SHA256_PREFIX + digest
    if em_len < len(t) + 11:
        raise ValueError("RSA modulus too small for RS256")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def rsa_sha256_sign(message: bytes, n: int, d: int) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = int.from_bytes(_emsa_encode(message, k), "big")
    return pow(em, d, n).to_bytes(k, "big")


def rsa_sha256_verify(message: bytes, signature: bytes, n: int, e: int) -> bool:
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    em = pow(int.from_bytes(signature, "big"), e, n).to_bytes(k, "big")
    return em == _emsa_encode(message, k)


# ---------------------------------------------------------------------------
# credentials
# ---------------------------------------------------------------------------


class ServiceAccountCredentials:
    """A service-account key as a picklable value object that mints
    (and caches) OAuth access tokens via the JWT-bearer grant."""

    def __init__(
        self,
        client_email: str,
        n: int,
        d: int,
        token_uri: str = "https://oauth2.googleapis.com/token",
        scope: str = GCS_READ_SCOPE,
        timeout: float = 30.0,
    ):
        self.client_email = client_email
        self.n = n
        self.d = d
        self.token_uri = token_uri
        self.scope = scope
        self.timeout = timeout
        self._token: str | None = None
        self._expiry = 0.0

    @classmethod
    def from_info(cls, info: dict, **kw) -> "ServiceAccountCredentials":
        key = parse_private_key_pem(info["private_key"])
        return cls(
            client_email=info["client_email"],
            n=key["n"],
            d=key["d"],
            token_uri=info.get("token_uri", "https://oauth2.googleapis.com/token"),
            **kw,
        )

    @classmethod
    def from_file(cls, path: str, **kw) -> "ServiceAccountCredentials":
        with open(path) as f:
            return cls.from_info(json.load(f), **kw)

    def _assertion(self, now: float) -> str:
        header = _b64url(json.dumps({"alg": "RS256", "typ": "JWT"}).encode())
        claims = _b64url(
            json.dumps(
                {
                    "iss": self.client_email,
                    "scope": self.scope,
                    "aud": self.token_uri,
                    "iat": int(now),
                    "exp": int(now) + 3600,
                }
            ).encode()
        )
        signing_input = f"{header}.{claims}".encode("ascii")
        sig = rsa_sha256_sign(signing_input, self.n, self.d)
        return f"{header}.{claims}.{_b64url(sig)}"

    def token(self) -> str:
        now = time.time()
        if self._token is not None and now < self._expiry - 60:
            return self._token
        body = urllib.parse.urlencode(
            {
                "grant_type": "urn:ietf:params:oauth:grant-type:jwt-bearer",
                "assertion": self._assertion(now),
            }
        ).encode("ascii")
        req = urllib.request.Request(
            self.token_uri,
            data=body,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            doc = json.loads(r.read())
        self._token = doc["access_token"]
        self._expiry = now + float(doc.get("expires_in", 3600))
        return self._token

    def __getstate__(self):
        # executors mint their own tokens: never ship a live one
        state = self.__dict__.copy()
        state["_token"] = None
        state["_expiry"] = 0.0
        return state
