"""Sinks: training-data export surfaces (sharded datasets + manifests)."""
