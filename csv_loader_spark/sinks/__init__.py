"""Sinks: nested-message envelope build + HTTP / Kinesis delivery."""
