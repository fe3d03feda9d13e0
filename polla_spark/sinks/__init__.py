"""Outbound sinks: Google Sheets rows, Slack notifications, artifacts."""
