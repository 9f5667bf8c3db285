"""Side-effect notification components (reference capability A10).

The reference posts a Slack webhook message after its daily S3 sync and
pings a healthcheck endpoint (``mitx/mitx_etl.py:158-192``). Here those
are executable driver-side components with an injectable transport:
callers (and tests) pass any ``(url, payload) -> None`` callable, the
default uses urllib from the standard library. The data plane never
sees these — notifications observe a finished sync, they don't gate it.

Error posture mirrors the reference exactly:
  * Slack delivery failures are swallowed with a warning
    (``mitx_etl.py:173-178`` catches RequestException and logs) — a
    chat outage must not fail a completed sync.
  * Healthcheck failures RAISE (``mitx_etl.py:186-192`` exits 1) — the
    monitor not hearing a heartbeat is an operational failure.
"""

from __future__ import annotations

import json
import logging
import urllib.request
from collections.abc import Callable
from dataclasses import dataclass, field

log = logging.getLogger(__name__)

# transport signature: (url, json_payload_or_None) -> None.  POST when a
# payload is given, GET when None.
Transport = Callable[[str, dict | None], None]


def _urllib_transport(url: str, payload: dict | None) -> None:
    if payload is None:
        req = urllib.request.Request(url, method="GET")
    else:
        req = urllib.request.Request(
            url,
            data=json.dumps(payload).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
    with urllib.request.urlopen(req, timeout=10):
        pass


@dataclass(frozen=True)
class SyncReport:
    """What a finished (or failed) sync run looked like — the payload
    every notification hook receives."""

    ds: str
    out_path: str
    source: str
    artifact_count: int = 0
    ok: bool = True
    error: str = ""

    def summary(self) -> str:
        if self.ok:
            return (
                f"Successfully exported {self.artifact_count} artifacts "
                f"from {self.source} for ds={self.ds}"
            )
        return f"Sync failed for ds={self.ds}: `{self.error}`"


@dataclass
class SlackNotifier:
    """Webhook POST mirroring the reference's message shape
    (``mitx_etl.py:164-172``: text/username/icon_emoji json body)."""

    webhook_url: str
    bot_username: str = "etl-bot"
    bot_emoji: str = ":robot_face:"
    transport: Transport = field(default=_urllib_transport)

    def __call__(self, report: SyncReport) -> None:
        try:
            self.transport(
                self.webhook_url,
                {
                    "text": report.summary(),
                    "username": self.bot_username,
                    "icon_emoji": self.bot_emoji,
                },
            )
        except Exception as err:  # noqa: BLE001 — delivery is best-effort
            log.warning("Failed to notify slack channel: %s", err)


@dataclass
class HealthcheckNotifier:
    """GET ping to a dead-man's-switch monitor (``mitx_etl.py:181-192``).
    Raises on failure — silence toward the monitor is an incident."""

    url: str
    transport: Transport = field(default=_urllib_transport)

    def __call__(self, report: SyncReport) -> None:
        self.transport(self.url, None)


def fanout(*hooks: Callable[[SyncReport], None]) -> Callable[[SyncReport], None]:
    """Compose hooks; each sees the same report, in order."""

    def _run(report: SyncReport) -> None:
        for h in hooks:
            h(report)

    return _run
