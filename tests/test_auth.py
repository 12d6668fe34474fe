"""Auth option construction + RFC 8693 exchange — the scenarios from the
reference's auth_test.go:22-188 (endpoint override, both credentials file
formats, FIXED and JWT sources, value/file token sources), driven against
a live in-process token-exchange HTTP server."""

import base64
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from aardappel_spark.auth import (
    AuthConfig,
    AuthConfigError,
    FileTokenSource,
    Oauth2TokenExchangeProvider,
    create_auth_provider,
    kafka_sasl_options,
    parse_credentials_file,
)


@pytest.fixture()
def exchange_server():
    """Local stand-in for the STS endpoint: records the last form-encoded
    request, answers with a fixed access token (startTokenExchangeServer
    in the reference test)."""
    captured = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers["Content-Length"])
            captured["form"] = dict(
                urllib.parse.parse_qsl(self.rfile.read(length).decode())
            )
            body = json.dumps(
                {"access_token": "very-very-token", "token_type": "Bearer"}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", captured
    finally:
        srv.shutdown()


ALT_FORMAT = """{
  "type": "oauth2_token_exchange",
  "oauth2_token_exchange": {
    "payload": {
      "grant_type": "urn:ietf:params:oauth:grant-type:token-exchange",
      "requested_token_type": "urn:ietf:params:oauth:token-type:access_token",
      "actor_token_type": "urn:ietf:params:oauth:token-type:jwt",
      "actor_token": {"type": "file", "file": %s},
      "subject_token_type": "urn:ietf:params:oauth:token-type:subject_id",
      "subject_token": {"type": "value", "value": "serviceaccount-xyz123"}
    },
    "exchanger": {"endpoint": %s}
  }
}"""


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_exactly_one_of_static_or_file(tmp_path):
    with pytest.raises(AuthConfigError, match="either oauth2_file or static_token"):
        create_auth_provider(AuthConfig())
    with pytest.raises(AuthConfigError, match="either oauth2_file or static_token"):
        create_auth_provider(
            AuthConfig(credentials_file="x.json", static_token="tok")
        )


def test_static_token_used_directly():
    p = create_auth_provider(AuthConfig(static_token="final-token"))
    assert p.token() == "final-token"


def test_alt_format_with_endpoint_override(tmp_path, exchange_server):
    """Reference case 1: config-level exchanger endpoint overrides the
    (deliberately invalid) endpoint in the credentials file; actor token
    read from a mounted file, subject token inline."""
    url, captured = exchange_server
    actor_file = _write(tmp_path, "actor-token", "eyIKwhatever.claims.signature")
    creds = _write(
        tmp_path,
        "creds.json",
        ALT_FORMAT
        % (
            json.dumps(actor_file),
            json.dumps("http://127.0.0.1:1?some-invalid-endpoint"),
        ),
    )
    p = create_auth_provider(
        AuthConfig(credentials_file=creds, exchanger_endpoint=url)
    )
    assert p.token() == "Bearer very-very-token"
    assert captured["form"] == {
        "grant_type": "urn:ietf:params:oauth:grant-type:token-exchange",
        "requested_token_type": "urn:ietf:params:oauth:token-type:access_token",
        "actor_token": "eyIKwhatever.claims.signature",
        "actor_token_type": "urn:ietf:params:oauth:token-type:jwt",
        "subject_token": "serviceaccount-xyz123",
        "subject_token_type": "urn:ietf:params:oauth:token-type:subject_id",
    }


def test_alt_format_endpoint_from_file(tmp_path, exchange_server):
    """Reference case 5: no config override — the file's endpoint wins."""
    url, captured = exchange_server
    actor_file = _write(tmp_path, "actor-token", "actor-jwt")
    creds = _write(
        tmp_path,
        "creds.json",
        ALT_FORMAT % (json.dumps(actor_file), json.dumps(url)),
    )
    p = create_auth_provider(AuthConfig(credentials_file=creds))
    assert p.token() == "Bearer very-very-token"
    assert captured["form"]["actor_token"] == "actor-jwt"


def test_sdk_format_fixed_subject(tmp_path, exchange_server):
    """Reference cases 2+3: native SDK format with FIXED credentials;
    defaults fill grant_type/requested_token_type; endpoint comes from
    config override or the file's token-endpoint."""
    url, captured = exchange_server
    creds = _write(
        tmp_path,
        "creds.json",
        json.dumps(
            {
                "subject-credentials": {
                    "type": "FIXED",
                    "token": "subject-token",
                    "token-type": "urn:ietf:params:oauth:token-type:jwt",
                }
            }
        ),
    )
    p = create_auth_provider(
        AuthConfig(credentials_file=creds, exchanger_endpoint=url)
    )
    assert p.token() == "Bearer very-very-token"
    assert captured["form"] == {
        "grant_type": "urn:ietf:params:oauth:grant-type:token-exchange",
        "requested_token_type": "urn:ietf:params:oauth:token-type:access_token",
        "subject_token": "subject-token",
        "subject_token_type": "urn:ietf:params:oauth:token-type:jwt",
    }

    # endpoint sourced from the credentials file instead
    creds2 = _write(
        tmp_path,
        "creds2.json",
        json.dumps(
            {
                "token-endpoint": url,
                "subject-credentials": {
                    "type": "FIXED",
                    "token": "subject-token",
                    "token-type": "urn:ietf:params:oauth:token-type:jwt",
                },
            }
        ),
    )
    p2 = create_auth_provider(AuthConfig(credentials_file=creds2))
    assert p2.token() == "Bearer very-very-token"


def test_sdk_format_jwt_subject(tmp_path, exchange_server):
    """Reference case 4: JWT subject credentials — a fresh RS256-signed
    token per exchange; verify the signature with the public key and the
    registered claims."""
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding, rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    ).decode()

    url, captured = exchange_server
    creds = _write(
        tmp_path,
        "creds.json",
        json.dumps(
            {
                "token-endpoint": "http://127.0.0.1:1?overridden",
                "subject-credentials": {
                    "type": "JWT",
                    "alg": "RS256",
                    "private-key": pem,
                    "kid": "test-key-id",
                    "iss": "test-issuer",
                    "sub": "test-subject",
                    "aud": "test-audience",
                    "jti": "test-jwt-id",
                },
            }
        ),
    )
    p = create_auth_provider(
        AuthConfig(credentials_file=creds, exchanger_endpoint=url)
    )
    assert p.token() == "Bearer very-very-token"
    form = captured["form"]
    assert form["subject_token_type"] == "urn:ietf:params:oauth:token-type:jwt"

    header_b64, payload_b64, sig_b64 = form["subject_token"].split(".")

    def unb64(s):
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

    header = json.loads(unb64(header_b64))
    claims = json.loads(unb64(payload_b64))
    assert header == {"alg": "RS256", "typ": "JWT", "kid": "test-key-id"}
    assert claims["iss"] == "test-issuer"
    assert claims["sub"] == "test-subject"
    assert claims["aud"] == "test-audience"
    assert claims["jti"] == "test-jwt-id"
    assert claims["exp"] > claims["iat"]
    # signature must verify against the public key (raises on mismatch)
    key.public_key().verify(
        unb64(sig_b64),
        f"{header_b64}.{payload_b64}".encode(),
        padding.PKCS1v15(),
        hashes.SHA256(),
    )


def test_token_source_validation(tmp_path):
    def alt(payload):
        return _write(
            tmp_path,
            "c.json",
            json.dumps(
                {
                    "type": "oauth2_token_exchange",
                    "oauth2_token_exchange": {
                        "payload": payload,
                        "exchanger": {"endpoint": "http://e"},
                    },
                }
            ),
        )

    with pytest.raises(AuthConfigError, match="requires token type"):
        parse_credentials_file(
            alt({"subject_token": {"type": "value", "value": "v"}})
        )
    with pytest.raises(AuthConfigError, match="type value requires value"):
        parse_credentials_file(
            alt({"subject_token_type": "t", "subject_token": {"type": "value"}})
        )
    with pytest.raises(AuthConfigError, match="type file requires file"):
        parse_credentials_file(
            alt({"subject_token_type": "t", "subject_token": {"type": "file"}})
        )
    with pytest.raises(AuthConfigError, match="unsupported oauth2"):
        parse_credentials_file(
            alt({"subject_token_type": "t", "subject_token": {"type": "weird"}})
        )
    from aardappel_spark.auth import Oauth2ExchangeCredentials

    with pytest.raises(AuthConfigError, match="requires an endpoint"):
        Oauth2TokenExchangeProvider(Oauth2ExchangeCredentials())


def test_file_token_source_reads_per_call(tmp_path):
    """auth.go:58-67 semantics: mounted tokens rotate; every exchange
    must see the file's CURRENT content."""
    p = tmp_path / "tok"
    p.write_text("first")
    src = FileTokenSource(str(p), "tt")
    assert src.token() == ("first", "tt")
    p.write_text("second")
    assert src.token() == ("second", "tt")


def test_caching_provider_exchanges_once_per_ttl():
    from aardappel_spark.auth import CachingTokenProvider

    calls = []

    class Counting:
        def token(self):
            calls.append(1)
            return f"tok-{len(calls)}"

    clock = [1000.0]
    p = CachingTokenProvider(Counting(), ttl_seconds=60, clock=lambda: clock[0])
    assert p.token() == "tok-1"
    clock[0] += 30
    assert p.token() == "tok-1"  # within ttl: cached, no second exchange
    clock[0] += 31
    assert p.token() == "tok-2"  # expired: refreshed
    p.invalidate()
    assert p.token() == "tok-3"  # forced refresh (e.g. broker 401)
    assert len(calls) == 3


def test_kafka_sasl_options_compose_with_reader():
    from aardappel_spark.sources import kafka_reader_options

    opts = {
        **kafka_reader_options("b:9092", "t"),
        **kafka_sasl_options("Bearer very-very-token"),
    }
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"
    assert "very-very-token" in opts["kafka.sasl.jaas.config"]
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    plain = kafka_sasl_options("tok", mechanism="PLAIN")
    assert 'password="tok"' in plain["kafka.sasl.jaas.config"]
    with pytest.raises(AuthConfigError):
        kafka_sasl_options("tok", mechanism="GSSAPI")
