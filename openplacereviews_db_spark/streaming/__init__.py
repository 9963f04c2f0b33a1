"""Structured Streaming pipelines — see streaming.pipelines."""
