"""Deterministic load generators -- the engine-side analog of the
reference's Kafka bots (bots/bot_random.py:23-28 payload shape, rates
50-500 msg/s across bots/bot_*.py). Without a broker, fixtures are written
as JSON-lines files replayed through the file/text stream source; the
payload contract matches FIXTURES.md section 4.
"""

from __future__ import annotations

import json
import os
import random

OCCUPATIONS = [
    "otros", "academico", "artista", "administrativo", "universitario",
    "atencion al cliente", "medico", "directivo", "granjero", "amo de casa",
    "estudiante", "abogado", "programador", "jubilado", "ventas",
    "cientifico", "autonomo", "tecnico", "comercial", "desempleado", "escritor",
]

GENDERS = ["Hombre", "Mujer"]


def generate_feedback_events(n: int, seed: int = 42, age_range: tuple[int, int] = (18, 70)) -> list[dict]:
    """Payloads matching the feedback topic contract
    (app3/live_counts.py:29-39): gender/occupation/age + 5 film ratings."""
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        out.append(
            {
                "gender": rng.choice(GENDERS),
                "occupation": rng.choice(OCCUPATIONS),
                "age": rng.randint(*age_range),
                "ratings": [
                    {"filmId": rng.randint(1, 5), "rating": rng.randint(1, 5)}
                    for _ in range(5)
                ],
            }
        )
    return out


def write_feedback_jsonl(dir_path: str, n: int, files: int = 1, seed: int = 42) -> list[dict]:
    """Write n events split across ``files`` JSON-lines files (one file per
    micro-batch when replayed with maxFilesPerTrigger=1). Returns the
    events for oracle-side recomputation."""
    os.makedirs(dir_path, exist_ok=True)
    events = generate_feedback_events(n, seed=seed)
    per = max(1, n // files)
    for i in range(files):
        chunk = events[i * per : (i + 1) * per] if i < files - 1 else events[(files - 1) * per :]
        with open(os.path.join(dir_path, f"feedback_{i:04d}.jsonl"), "w") as f:
            for e in chunk:
                f.write(json.dumps(e) + "\n")
    return events
