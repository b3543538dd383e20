"""Durable state: per-partition lineage manifests + checkpoint/resume."""
