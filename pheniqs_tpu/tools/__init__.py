"""Companion config-generation tools (reference tool/pheniqs-*-api.py):
prior estimation application, Illumina run-folder config generation, and
output-layout rewriting."""
