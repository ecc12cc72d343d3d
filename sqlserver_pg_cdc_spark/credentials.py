"""Credential resolution (reference O5 support, cli/credentials.py).

Order: explicit args > environment variables > optional Vault (gated
behind an import-try — hvac is not part of this environment). Never logs
secret material; raises with the *name* of the missing variable only.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class DbCredentials:
    user: str
    password: str

    def __repr__(self) -> str:  # never leak the secret in logs/tracebacks
        return f"DbCredentials(user={self.user!r}, password='***')"


def from_env(prefix: str) -> DbCredentials:
    """Read {PREFIX}_USER / {PREFIX}_PASSWORD from the environment."""
    user = os.environ.get(f"{prefix}_USER")
    password = os.environ.get(f"{prefix}_PASSWORD")
    missing = [
        n
        for n, v in ((f"{prefix}_USER", user), (f"{prefix}_PASSWORD", password))
        if not v
    ]
    if missing:
        raise ValueError(f"missing credential environment variables: {missing}")
    return DbCredentials(user, password)


def parse_vault_ref(ref: str) -> tuple[str, str, str]:
    """Parse the reference deployment's config placeholder syntax
    ``${vault:<mount>/<path>:<key>}`` (e.g. docker/configs/debezium/
    sqlserver-source.json:17 ``${vault:secret/database:sqlserver_user}``)
    into (mount, path, key)."""
    if not (ref.startswith("${vault:") and ref.endswith("}")):
        raise ValueError(f"not a vault reference: {ref!r}")
    body = ref[len("${vault:"):-1]
    location, sep, key = body.rpartition(":")
    if not sep or not location or not key:
        raise ValueError(f"malformed vault reference: {ref!r}")
    mount, sep, path = location.partition("/")
    if not sep or not path:
        raise ValueError(f"malformed vault reference: {ref!r}")
    return mount, path, key


def from_vault(path: str, mount: str = "secret") -> DbCredentials:
    """Vault-backed credentials; available only when hvac is installed
    and VAULT_ADDR/VAULT_TOKEN are configured."""
    try:
        import hvac  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "vault support requires the hvac package (not installed)"
        ) from e
    client = hvac.Client(
        url=os.environ["VAULT_ADDR"], token=os.environ["VAULT_TOKEN"]
    )
    data = client.secrets.kv.v2.read_secret_version(path=path, mount_point=mount)
    secret = data["data"]["data"]
    return DbCredentials(secret["username"], secret["password"])


def resolve(prefix: str, use_vault: bool = False, vault_path: str | None = None) -> DbCredentials:
    """Reference resolution order: Vault when requested, env otherwise."""
    if use_vault:
        return from_vault(vault_path or prefix.lower())
    return from_env(prefix)
