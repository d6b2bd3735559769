"""Self-signed TLS for the Flight server, from ``TLS_DOMAIN``.

Mirrors the reference binaries: when ``TLS_DOMAIN`` is set they generate
a self-signed certificate for that domain at startup and serve Flight
over TLS; otherwise plaintext
(iceberg-datafusion-arrow-flight-sql/src/main.rs:83-94 — rcgen
``generate_simple_self_signed`` → tonic ``ServerTlsConfig``;
iceberg-datafusion-arrow-flight-rest/src/main.rs:100-111; README.md:11).

Python side: the stdlib-adjacent ``cryptography`` package generates the
same artifact (2048-bit RSA, CN=domain, SAN=domain, 1-year validity);
PyArrow Flight takes it via ``tls_certificates=[(cert_pem, key_pem)]``.
"""

from __future__ import annotations

import datetime
import os

__all__ = ["self_signed_pair", "tls_domain"]


def tls_domain() -> str | None:
    """The reference's env contract: TLS iff TLS_DOMAIN is set."""
    return os.environ.get("TLS_DOMAIN") or None


def self_signed_pair(domain: str) -> tuple[bytes, bytes]:
    """(cert_pem, key_pem) for ``domain`` — rcgen's
    generate_simple_self_signed, re-expressed."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, domain)])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=365))
        .add_extension(x509.SubjectAlternativeName([x509.DNSName(domain)]),
                       critical=False)
        .sign(key, hashes.SHA256())
    )
    cert_pem = cert.public_bytes(serialization.Encoding.PEM)
    key_pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.TraditionalOpenSSL,
        serialization.NoEncryption())
    return cert_pem, key_pem
