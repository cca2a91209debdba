"""The flagship syllabus pipeline: sessionize → extract → plan →
batch → join → generate → sink, as one lazy DataFrame expression."""

from .flagship import run_flagship  # noqa: F401
