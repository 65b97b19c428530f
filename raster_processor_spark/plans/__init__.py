"""Composed multi-stage query plans (the engine's 'jobs')."""
