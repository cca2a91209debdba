"""Deterministic stand-ins for the reference's three LLM nodes.

The reference calls gpt-4o-mini behind Pydantic-validated prompts
(syllabus_ai_graph.py:75,131,260). Correctness must be hermetic
(SURVEY.md §5), so the engine keeps the exact UDF seam — Arrow-batched
``mapInPandas`` / ``applyInPandas`` with the declared output schemas —
but the model call is a seeded hash generator honoring the same output
contracts:

- extraction (A8, syllabus_ai_graph.py:45-90): topic → >=1 subtopics;
  parse failure → empty (here: topics with empty titles yield none);
- planning (A9, :92-144): >=9 planned questions per subtopic (prompt
  contract at :112);
- generation (A13, :184-271): exactly 4 choices, exactly 1 correct,
  question_id and difficulty preserved from the plan (:220-231).

Swapping a real model back in means replacing ``_h``-derived fields
with client calls — the Spark plumbing (schemas, batching,
partitioning) is identical.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import PLANNED_QUESTION_SCHEMA, QUESTION_SCHEMA, SUBTOPIC_SCHEMA

DIFFICULTIES = ("Easy", "Medium", "Hard")


def _h(s: str, mod: int) -> int:
    """Deterministic small hash (never Python's randomized hash())."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") % mod


def extract_subtopics(topics: DataFrame, subject: str = "chemistry") -> DataFrame:
    """A8: topic rows → subtopic rows via Arrow-batched mapInPandas.

    Input: TOPIC_SCHEMA-shaped rows (doc_id, topic_id, title, elements).
    1→N expansion happens inside the batch iterator, so one topic never
    holds more than its own subtopics in memory.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            # zip over column lists, not iterrows: row materialization
            # cost dominates the stand-in generation otherwise.
            for title, elements in zip(pdf["title"].tolist(), pdf["elements"].tolist()):
                title = title or ""
                if not title.strip():
                    continue  # extraction failure → empty (A8 :88-90)
                n_sub = 2 + _h(f"nsub:{title}", 3)
                n_elem = len(elements) if elements is not None else 0
                for i in range(n_sub):
                    name = f"{title} — part {i + 1}"
                    out.append(
                        {
                            "subtopic_name": name,
                            "topic_title": title,
                            "academic_class": f"Form {1 + _h(name, 2)}",
                            "subject": subject,
                            "learning_objectives": [
                                f"objective {j + 1} of {name}" for j in range(2 + _h(name, 2))
                            ],
                            "key_concepts": [f"concept {j + 1}" for j in range(1 + n_elem % 3)],
                            "assessment_criteria": [f"criterion {j + 1}" for j in range(2)],
                            "suggested_activities": [f"activity {j + 1}" for j in range(1 + _h(name, 3))],
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in SUBTOPIC_SCHEMA.fields]
            )

    return topics.mapInPandas(gen, SUBTOPIC_SCHEMA)


def plan_questions(subtopics: DataFrame, min_per_subtopic: int = 9) -> DataFrame:
    """A9: plan generation — one plan per topic, >=9 planned questions
    per subtopic (prompt contract syllabus_ai_graph.py:112).

    Implementation note: the reference plans per topic, but each
    planned question is a pure function of its own subtopic row — so
    this is ``mapInPandas`` over Arrow batches rather than
    ``applyInPandas`` grouped by topic: the output SET is identical,
    and dropping the group shuffle removes both an exchange and the
    per-tiny-group Arrow conversion overhead (topics average a handful
    of subtopics; partitions average thousands of rows). The same
    optimization is documented on ``generate_questions``.
    """

    def gen(batches):
        for pdf in batches:
            out = []
            for name, topic_title, key_concepts in zip(
                pdf["subtopic_name"].tolist(),
                pdf["topic_title"].tolist(),
                pdf["key_concepts"].tolist(),
            ):
                n_q = min_per_subtopic + _h(f"nq:{name}", 3)
                concepts = list(key_concepts) if key_concepts is not None else []
                if not concepts:
                    concepts = ["general"]
                for i in range(n_q):
                    qid = hashlib.md5(
                        f"{topic_title}|{name}|{i}".encode()
                    ).hexdigest()[:12]
                    out.append(
                        {
                            "question_id": f"q_{qid}",
                            "topic": topic_title,
                            "subtopic": name,
                            "difficulty": DIFFICULTIES[_h(qid, 3)],
                            "concept_area": concepts[i % len(concepts)],
                            "status": "planned",
                        }
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in PLANNED_QUESTION_SCHEMA.fields]
            )

    return subtopics.mapInPandas(gen, PLANNED_QUESTION_SCHEMA)


def generate_questions(batches: DataFrame) -> DataFrame:
    """A13: grouped-map question generation per (topic, batch_id) —
    the reference's micro-batch of 5 (bounding each external call)
    becomes the Arrow batch. Output contract: exactly 4 choices,
    exactly 1 correct, non-empty explanation/hint, id + difficulty
    preserved (syllabus_ai_graph.py:220-231).

    Input must carry plan columns + the joined subtopic context
    (academic_class) — the miss-drop join (A12) happens upstream.

    Implementation note: this is ``mapInPandas`` with a per-(topic,
    batch_id) loop inside the worker rather than ``applyInPandas``
    grouped by batch: the semantics are identical (each batch is still
    one unit — one model call in the non-stand-in version), but one
    Arrow conversion per *partition* replaces one per *batch*, which
    at 5-row batches is the difference between 32 and n_questions/5
    nested-schema conversions. The grouped shuffle is unnecessary
    because generation is row-local given the joined context.
    """

    def _rows_for(pdf: pd.DataFrame) -> list[dict]:
        out = []
        for qid, concept, topic, subtopic, academic_class, difficulty in zip(
            pdf["question_id"].tolist(),
            pdf["concept_area"].tolist(),
            pdf["topic"].tolist(),
            pdf["subtopic"].tolist(),
            pdf["academic_class"].tolist(),
            pdf["difficulty"].tolist(),
        ):
            correct = _h(qid, 4)
            choices = [
                {"text": f"choice {j + 1} for {qid}", "is_correct": j == correct}
                for j in range(4)
            ]
            out.append(
                {
                    "question_id": qid,
                    "text": f"Question on {concept} ({qid})?",
                    "topic": topic,
                    "sub_topic": subtopic,
                    "academic_class": academic_class,
                    "examination_level": "MSCE",
                    "difficulty": difficulty,
                    "tags": [concept, difficulty.lower()],
                    "choices": choices,
                    "solution": {
                        "explanation": f"Because choice {correct + 1} is correct.",
                        "steps": [f"step {s + 1}" for s in range(2 + _h(qid + "s", 2))],
                    },
                    "hint": f"Consider {concept}.",
                    "metadata": {
                        "created_by": "syllabus_sense_spark",
                        "created_at": "2026-01-01T00:00:00Z",
                        "updated_at": "2026-01-01T00:00:00Z",
                        "time_estimate": {"minutes": str(1 + _h(qid, 5))},
                    },
                }
            )
        return out

    def gen(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in QUESTION_SCHEMA.fields]
        for pdf in chunks:
            out: list[dict] = []
            # One "call" per (topic, batch_id) — the reference's
            # micro-batch boundary (syllabus_ai_graph.py:163-167).
            for _, batch in pdf.groupby(["topic", "batch_id"], sort=False):
                out.extend(_rows_for(batch))
            yield pd.DataFrame(out, columns=cols)

    return batches.mapInPandas(gen, QUESTION_SCHEMA)
