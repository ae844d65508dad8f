"""Declarative query plans: headline analytics over the bench tables."""
