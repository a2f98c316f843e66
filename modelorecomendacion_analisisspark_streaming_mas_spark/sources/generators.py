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


def write_movielens_fixtures(
    dir_path: str,
    n_movies: int = 200,
    n_users: int = 300,
    n_ratings: int = 5000,
    seed: int = 42,
) -> dict[str, str]:
    """Deterministic MovieLens-shaped ``::``-separated .dat fixtures per
    FIXTURES.md sections 1-3: titles with extractable years, pipe-joined
    genres, zips including unmapped ones (exercises the 'Other' fill),
    a few orphan filmIds and duplicate (user,film) pairs."""
    rng = random.Random(seed)
    os.makedirs(dir_path, exist_ok=True)
    genres = [
        "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
        "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
        "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western",
    ]
    words = ["Silent", "Golden", "Lost", "Broken", "Midnight", "Electric", "Paper", "Iron"]
    nouns = ["City", "River", "Dream", "Garden", "Empire", "Station", "Harbor", "Mirror"]

    movies_path = os.path.join(dir_path, "movies.dat")
    with open(movies_path, "w", encoding="ISO-8859-1") as f:
        for mid in range(1, n_movies + 1):
            title = f"{rng.choice(words)} {rng.choice(nouns)} ({rng.randint(1950, 2000)})"
            gs = "|".join(rng.sample(genres, rng.randint(1, 3)))
            f.write(f"{mid}::{title}::{gs}\n")

    users_path = os.path.join(dir_path, "users.dat")
    age_codes = [1, 18, 25, 35, 45, 50, 56]
    with open(users_path, "w", encoding="ISO-8859-1") as f:
        for uid in range(1, n_users + 1):
            zip5 = f"{rng.randint(1, 999):03d}{rng.randint(0, 99):02d}"
            if uid % 29 == 0:  # unmapped prefix -> 'Other'
                zip5 = f"999{rng.randint(0, 99):02d}"
            f.write(
                f"{uid}::{rng.choice('MF')}::{rng.choice(age_codes)}::"
                f"{rng.randint(0, 20)}::{zip5}\n"
            )

    ratings_path = os.path.join(dir_path, "ratings.dat")
    with open(ratings_path, "w", encoding="ISO-8859-1") as f:
        for _ in range(n_ratings):
            uid = rng.randint(1, n_users)
            # ~2% orphan filmIds beyond the movie catalog (left-join nulls)
            mid = rng.randint(1, n_movies + max(1, n_movies // 50))
            ts = rng.randint(946684800, 1046684800)  # ~2000-2003
            f.write(f"{uid}::{mid}::{rng.randint(1, 5)}::{ts}\n")
        # planted duplicate (user,film) pairs
        for _ in range(25):
            f.write(f"1::1::{rng.randint(1, 5)}::{rng.randint(946684800, 1046684800)}\n")

    return {"movies": movies_path, "users": users_path, "ratings": ratings_path}


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


# --------------------------------------------------------------------------
# Bot profiles: the reference runs five demographic Kafka bots
# (bots/bot_random.py, bot_random50.py, bot_revista.py, bot_inserso.py,
# bot_masculino.py -- each fixes a gender/occupation/age slice and a send
# rate). Same slices here, emitting to the JSONL spool the file-stream
# source replays (the broker-free transport used across this repo).
# --------------------------------------------------------------------------

BOT_PROFILES: dict[str, dict] = {
    # name: demographics + default msgs/sec (reference defaults)
    "random": {"genders": GENDERS, "occupations": OCCUPATIONS, "age_range": (18, 70), "rate": 100.0},
    "random50": {"genders": GENDERS, "occupations": OCCUPATIONS, "age_range": (18, 70), "rate": 50.0},
    "revista": {"genders": ["Mujer"], "occupations": ["estudiante"], "age_range": (10, 16), "rate": 250.0},
    "inserso": {"genders": GENDERS, "occupations": ["jubilado"], "age_range": (66, 90), "rate": 500.0},
    "masculino": {"genders": ["Hombre"], "occupations": OCCUPATIONS, "age_range": (25, 40), "rate": 200.0},
}


def generate_profile_events(bot: str, n: int, seed: int = 42) -> list[dict]:
    """n payloads drawn from a named bot profile's demographic slice."""
    prof = BOT_PROFILES[bot]
    rng = random.Random(seed)
    lo, hi = prof["age_range"]
    return [
        {
            "gender": rng.choice(prof["genders"]),
            "occupation": rng.choice(prof["occupations"]),
            "age": rng.randint(lo, hi),
            "ratings": [
                {"filmId": rng.randint(1, 5), "rating": rng.randint(1, 5)}
                for _ in range(5)
            ],
        }
        for _ in range(n)
    ]


def run_bot(
    bot: str,
    out_dir: str,
    rate: float | None = None,
    count: int = 0,
    seed: int = 42,
    tick_s: float = 1.0,
) -> int:
    """Emit profile payloads into the spool at ~``rate`` msg/s, one JSONL
    file per tick (== one micro-batch under maxFilesPerTrigger=1).
    ``count=0`` runs until killed (the panel's stop sends SIGTERM);
    returns total events written."""
    import time

    prof = BOT_PROFILES[bot]
    rate = prof["rate"] if rate is None else rate
    os.makedirs(out_dir, exist_ok=True)
    per_tick = max(1, int(rate * tick_s))
    written = 0
    tick = 0
    while count <= 0 or written < count:
        n = per_tick if count <= 0 else min(per_tick, count - written)
        events = generate_profile_events(bot, n, seed=seed + tick)
        path = os.path.join(out_dir, f"{bot}_{os.getpid()}_{tick:06d}.jsonl")
        tmp = path + ".tmp"  # atomic rename: the file stream never sees partials
        with open(tmp, "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, path)
        written += n
        tick += 1
        if count > 0 and written >= count:
            break
        time.sleep(tick_s)
    return written


def _main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(description="feedback bot: emit profile payloads to a JSONL spool")
    p.add_argument("--bot", required=True, choices=sorted(BOT_PROFILES))
    p.add_argument("--out", required=True, help="spool directory")
    p.add_argument("--rate", type=float, default=None, help="msgs/sec (default: profile rate)")
    p.add_argument("--count", type=int, default=0, help="total messages (0 = run until killed)")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)
    return 0 if run_bot(args.bot, args.out, args.rate, args.count, args.seed) >= 0 else 1


if __name__ == "__main__":  # pragma: no cover - subprocess entry
    raise SystemExit(_main())
