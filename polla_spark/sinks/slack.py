"""Slack notifiers (reference polla_app/notifiers.py:14-108).

Webhook URL comes from SLACK_WEBHOOK_URL; without it the notifier is a
no-op that still returns the payload it would have sent (testable
offline). Quarantine alerts use Block Kit and truncate to 15
mismatches (notifiers.py:84).
"""

from __future__ import annotations

import json
import os
from typing import Any

MAX_MISMATCH_BLOCKS = 15


class SlackNotifier:
    def __init__(self, webhook_url: str | None = None, poster=None) -> None:
        self.webhook_url = webhook_url or os.environ.get("SLACK_WEBHOOK_URL")
        self._poster = poster

    def _post(self, payload: dict[str, Any]) -> dict[str, Any]:
        if self._poster is not None:
            self._poster(self.webhook_url, payload)
        elif self.webhook_url:
            import requests

            requests.post(
                self.webhook_url,
                data=json.dumps(payload),
                headers={"Content-Type": "application/json"},
                timeout=10,
            )
        return payload

    def run_complete(self, summary: dict[str, Any]) -> dict[str, Any]:
        decision = summary.get("decision", {})
        text = (
            f"polla_spark run {summary.get('run_id', '?')[:8]}: "
            f"{decision.get('status', '?')} "
            f"(confidence={decision.get('confidence', '?')}, "
            f"publish={summary.get('publish')})"
        )
        return self._post({"text": text})

    def quarantine(self, summary: dict[str, Any],
                   mismatches: list[dict[str, Any]]) -> dict[str, Any]:
        blocks: list[dict[str, Any]] = [
            {
                "type": "header",
                "text": {"type": "plain_text", "text": "Pozo quarantine alert"},
            },
            {
                "type": "section",
                "text": {
                    "type": "mrkdwn",
                    "text": f"run `{summary.get('run_id', '?')}` quarantined: "
                    f"{summary.get('publish_reason', '')}",
                },
            },
        ]
        for m in mismatches[:MAX_MISMATCH_BLOCKS]:
            blocks.append(
                {
                    "type": "section",
                    "text": {
                        "type": "mrkdwn",
                        "text": f"*{m.get('categoria')}*: consensus "
                        f"{json.dumps(m.get('consensus', {}), ensure_ascii=False)} "
                        f"vs {json.dumps(m.get('disagreeing', {}), ensure_ascii=False)}",
                    },
                }
            )
        if len(mismatches) > MAX_MISMATCH_BLOCKS:
            blocks.append(
                {
                    "type": "context",
                    "elements": [
                        {
                            "type": "mrkdwn",
                            "text": f"…and {len(mismatches) - MAX_MISMATCH_BLOCKS} more",
                        }
                    ],
                }
            )
        return self._post({"blocks": blocks})
