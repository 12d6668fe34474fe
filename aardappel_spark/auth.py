"""Authentication options for the engine's external connections.

Reference parity: internal/auth/auth.go:69-174 and the package README —
each side of replication configures exactly ONE of a static access
token or an OAuth2 credentials file, in either of two JSON formats:

  * the native SDK format (``token-endpoint`` + ``subject-credentials``
    with FIXED or JWT token sources), or
  * the alternative ``oauth2_token_exchange`` format whose payload
    describes the exchange request while secret tokens may live in
    separate files (``type: value`` inline / ``type: file`` mounted).

A side-specific exchanger endpoint from the engine config overrides the
endpoint in the credentials file (auth.go:85-87).

The Spark rebuild keeps the exact config surface and parsing semantics
but terminates where a Spark deployment consumes credentials: a bearer
token from ``TokenProvider.token()`` (attached to source/sink clients)
and SASL options for the Kafka reader (``kafka_sasl_options``). The
OAuth2 path performs a real RFC 8693 token-exchange POST — the same
protocol the reference delegates to its SDK — with the HTTP call
injectable so tests can assert the assembled request.
"""

from __future__ import annotations

import base64
import json
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

GRANT_TYPE_TOKEN_EXCHANGE = "urn:ietf:params:oauth:grant-type:token-exchange"
REQUESTED_TOKEN_TYPE_ACCESS = "urn:ietf:params:oauth:token-type:access_token"


@dataclass
class AuthConfig:
    """The engine-config surface (AuthConfig, auth.go:52-56)."""

    credentials_file: str = ""
    static_token: str = ""
    exchanger_endpoint: str = ""


class AuthConfigError(ValueError):
    pass


# -- token sources (auth.go:41-67, 155-174) ---------------------------------


class FixedTokenSource:
    """A literal token value (NewFixedTokenSource / type "value")."""

    def __init__(self, value: str, token_type: str):
        self.value = value
        self.token_type = token_type

    def token(self) -> tuple[str, str]:
        return self.value, self.token_type


class FileTokenSource:
    """Reads the token file on EVERY call (fileTokenSource.Token,
    auth.go:58-67) — mounted service-account tokens rotate underneath
    the process, so the value must never be cached at parse time."""

    def __init__(self, path: str, token_type: str):
        self.path = path
        self.token_type = token_type

    def token(self) -> tuple[str, str]:
        try:
            with open(self.path) as f:
                return f.read(), self.token_type
        except OSError as e:
            raise AuthConfigError(f"read token file {self.path!r}: {e}") from e


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


class JwtTokenSource:
    """Self-signed JWT source (the SDK-format "JWT" subject credentials:
    alg/private-key/kid/iss/sub/aud/jti). Signs a fresh token per call
    with an ``iat``/``exp`` window, RS256/PKCS1v15-SHA256 — the signing
    profile the reference's SDK uses for this source type."""

    def __init__(
        self,
        private_key_pem: str,
        alg: str = "RS256",
        kid: str | None = None,
        iss: str | None = None,
        sub: str | None = None,
        aud: str | None = None,
        jti: str | None = None,
        ttl_seconds: int = 3600,
        token_type: str = "urn:ietf:params:oauth:token-type:jwt",
    ):
        if alg != "RS256":
            raise AuthConfigError(f"unsupported jwt alg {alg!r} (RS256 only)")
        self.private_key_pem = private_key_pem
        self.alg = alg
        self.kid = kid
        self.claims = {"iss": iss, "sub": sub, "aud": aud, "jti": jti}
        self.ttl_seconds = ttl_seconds
        self.token_type = token_type

    def token(self) -> tuple[str, str]:
        try:
            from cryptography.hazmat.primitives import hashes, serialization
            from cryptography.hazmat.primitives.asymmetric import padding
        except ImportError as e:  # pragma: no cover - baked into the env
            raise AuthConfigError("jwt token source requires 'cryptography'") from e

        header = {"alg": self.alg, "typ": "JWT"}
        if self.kid:
            header["kid"] = self.kid
        now = int(time.time())
        payload = {k: v for k, v in self.claims.items() if v}
        payload["iat"] = now
        payload["exp"] = now + self.ttl_seconds
        signing_input = (
            _b64url(json.dumps(header, separators=(",", ":")).encode())
            + "."
            + _b64url(json.dumps(payload, separators=(",", ":")).encode())
        )
        key = serialization.load_pem_private_key(
            self.private_key_pem.encode(), password=None
        )
        sig = key.sign(signing_input.encode(), padding.PKCS1v15(), hashes.SHA256())
        return signing_input + "." + _b64url(sig), self.token_type


# -- credentials-file parsing (auth.go:91-174) ------------------------------


@dataclass
class Oauth2ExchangeCredentials:
    """Everything needed to perform the RFC 8693 exchange."""

    endpoint: str = ""
    grant_type: str = GRANT_TYPE_TOKEN_EXCHANGE
    requested_token_type: str = REQUESTED_TOKEN_TYPE_ACCESS
    subject_source: object | None = None
    actor_source: object | None = None


def _alt_token_source(src: dict, token_type: str):
    """tokenSource (auth.go:155-174): type value|file, token type required."""
    if not token_type:
        raise AuthConfigError("oauth2 token exchange token source requires token type")
    kind = str(src.get("type", "")).lower()
    if kind == "value":
        if not src.get("value"):
            raise AuthConfigError(
                "oauth2 token exchange token source type value requires value"
            )
        return FixedTokenSource(src["value"], token_type)
    if kind == "file":
        if not src.get("file"):
            raise AuthConfigError(
                "oauth2 token exchange token source type file requires file"
            )
        return FileTokenSource(src["file"], token_type)
    raise AuthConfigError(
        f"unsupported oauth2 token exchange token source type {src.get('type')!r}"
    )


def _sdk_token_source(creds: dict):
    """Native-SDK-format credentials entry: FIXED or JWT
    (delegateCredentialsFileToSdk, auth.go:111-117; README 'YDB SDK
    OAuth2 Format')."""
    kind = str(creds.get("type", "")).upper()
    if kind == "FIXED":
        if not creds.get("token") or not creds.get("token-type"):
            raise AuthConfigError("FIXED credentials require token and token-type")
        return FixedTokenSource(creds["token"], creds["token-type"])
    if kind == "JWT":
        if not creds.get("private-key"):
            raise AuthConfigError("JWT credentials require private-key")
        return JwtTokenSource(
            creds["private-key"],
            alg=creds.get("alg", "RS256"),
            kid=creds.get("kid"),
            iss=creds.get("iss"),
            sub=creds.get("sub"),
            aud=creds.get("aud"),
            jti=creds.get("jti"),
            ttl_seconds=int(creds.get("ttl-seconds", 3600)),
        )
    raise AuthConfigError(f"unsupported sdk credentials type {creds.get('type')!r}")


def parse_credentials_file(path: str) -> Oauth2ExchangeCredentials:
    """Dispatch on the file's ``type`` field exactly like
    oauth2CredentialsOptions (auth.go:91-109): the alternative
    ``oauth2_token_exchange`` format is assembled here, anything else is
    treated as the native SDK format."""
    try:
        with open(path) as f:
            data = json.load(f)
    except OSError as e:
        raise AuthConfigError(f"read oauth2 credentials file {path!r}: {e}") from e
    except json.JSONDecodeError as e:
        raise AuthConfigError(f"parse oauth2 credentials file {path!r}: {e}") from e

    if str(data.get("type", "")).lower() == "oauth2_token_exchange":
        section = data.get("oauth2_token_exchange", {})
        payload = section.get("payload", {})
        out = Oauth2ExchangeCredentials(
            endpoint=section.get("exchanger", {}).get("endpoint", ""),
            grant_type=payload.get("grant_type") or GRANT_TYPE_TOKEN_EXCHANGE,
            requested_token_type=payload.get("requested_token_type")
            or REQUESTED_TOKEN_TYPE_ACCESS,
        )
        if payload.get("subject_token", {}).get("type"):
            out.subject_source = _alt_token_source(
                payload["subject_token"], payload.get("subject_token_type", "")
            )
        if payload.get("actor_token", {}).get("type"):
            out.actor_source = _alt_token_source(
                payload["actor_token"], payload.get("actor_token_type", "")
            )
        return out

    out = Oauth2ExchangeCredentials(endpoint=data.get("token-endpoint", ""))
    if "subject-credentials" in data:
        out.subject_source = _sdk_token_source(data["subject-credentials"])
    if "actor-credentials" in data:
        out.actor_source = _sdk_token_source(data["actor-credentials"])
    return out


# -- providers (CreateYdbDriverAuthOptions, auth.go:69-89) ------------------


class StaticTokenProvider:
    """A final access token used directly, no exchange (README:7)."""

    def __init__(self, token: str):
        self._token = token

    def token(self) -> str:
        return self._token


class Oauth2TokenExchangeProvider:
    """Performs RFC 8693 token exchange at the configured endpoint.

    The POST form mirrors the reference's exchange request: grant_type,
    requested_token_type, and subject/actor token (+ their types) from
    the configured sources, re-read per call so file-mounted tokens stay
    fresh. Returns ``"<token_type> <access_token>"`` — the same shape
    the reference's obtained token has ("Bearer ...")."""

    def __init__(self, creds: Oauth2ExchangeCredentials, http_post=None):
        if not creds.endpoint:
            raise AuthConfigError("oauth2 token exchange requires an endpoint")
        self.creds = creds
        self._http_post = http_post or _urllib_post

    def exchange_form(self) -> dict[str, str]:
        form = {
            "grant_type": self.creds.grant_type,
            "requested_token_type": self.creds.requested_token_type,
        }
        if self.creds.subject_source is not None:
            value, token_type = self.creds.subject_source.token()
            form["subject_token"] = value
            form["subject_token_type"] = token_type
        if self.creds.actor_source is not None:
            value, token_type = self.creds.actor_source.token()
            form["actor_token"] = value
            form["actor_token_type"] = token_type
        return form

    def token(self) -> str:
        body = self._http_post(self.creds.endpoint, self.exchange_form())
        try:
            parsed = json.loads(body)
            return f"{parsed['token_type']} {parsed['access_token']}"
        except (json.JSONDecodeError, KeyError) as e:
            raise AuthConfigError(f"bad token exchange response: {body!r}") from e


def _urllib_post(endpoint: str, form: dict[str, str]) -> str:
    req = urllib.request.Request(
        endpoint,
        data=urllib.parse.urlencode(form).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.read().decode()


def create_auth_provider(config: AuthConfig, http_post=None):
    """Exactly one of static_token / credentials_file, like
    CreateYdbDriverAuthOptions (auth.go:69-89); the config-level
    exchanger endpoint overrides the file's (auth.go:85-87)."""
    has_file = bool(config.credentials_file)
    has_static = bool(config.static_token)
    if has_file == has_static:
        raise AuthConfigError(
            "it's either oauth2_file or static_token option must be set"
        )
    if has_static:
        return StaticTokenProvider(config.static_token)
    creds = parse_credentials_file(config.credentials_file)
    if config.exchanger_endpoint:
        creds.endpoint = config.exchanger_endpoint
    return Oauth2TokenExchangeProvider(creds, http_post=http_post)


class CachingTokenProvider:
    """Caches the wrapped provider's token for ``ttl_seconds`` — a
    deployment exchanges once per token lifetime, not once per request
    (the reference's SDK caches inside its credentials object). The
    clock is injectable for tests; ``invalidate()`` forces a refresh on
    the next call (e.g. after a 401 from the broker)."""

    def __init__(self, provider, ttl_seconds: float = 300.0, clock=time.time):
        self.provider = provider
        self.ttl = ttl_seconds
        self._clock = clock
        self._cached: str | None = None
        self._expires = 0.0

    def invalidate(self) -> None:
        self._cached = None

    def token(self) -> str:
        now = self._clock()
        if self._cached is None or now >= self._expires:
            self._cached = self.provider.token()
            self._expires = now + self.ttl
        return self._cached


# -- Spark-side consumption -------------------------------------------------


def kafka_sasl_options(token: str, mechanism: str = "OAUTHBEARER") -> dict[str, str]:
    """The option set a Kafka reader adds for token auth — composes with
    sources.kafka_reader_options. OAUTHBEARER carries the bearer token
    via the jaas config's extension; PLAIN maps token auth onto
    username/password style brokers."""
    if mechanism == "OAUTHBEARER":
        jaas = (
            "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule "
            f'required unsecuredLoginStringClaim_sub="{token}";'
        )
    elif mechanism == "PLAIN":
        jaas = (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="token" password="{token}";'
        )
    else:
        raise AuthConfigError(f"unsupported sasl mechanism {mechanism!r}")
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": mechanism,
        "kafka.sasl.jaas.config": jaas,
    }
