"""Per-event collector transforms (SURVEY.md §2.2-2.4), each a pure
``DataFrame -> DataFrame`` built from column expressions (JVM-side,
whole-stage-codegen-friendly).  The only Python-function operator is the
split bin-packer (``split.py``), per SURVEY §2.4.
"""
