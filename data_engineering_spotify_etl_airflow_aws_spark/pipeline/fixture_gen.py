"""Deterministic synthetic raw-playlist JSON inbox.

Generates the edge cases the reference's data implies (SURVEY.md §5):
mixed-precision release_date (yyyy | yyyy-MM | yyyy-MM-dd, P:109), albums
and artists repeating across days (D1/D2 dedup), multi-artist tracks (P2
explode), a null release_date, and rank churn across days (X1). One JSON
object per file - the raw Spotify playlist-response shape the reference
lands in S3 (P:199-207) - named spotify_raw_<date>.json so scrape_date
(X2) derives from the filename exactly as the reference's templated key
implies (P:68, P:203).

Rebuild with:  python -m data_engineering_spotify_etl_airflow_aws_spark.pipeline.fixture_gen
Output is committed at data/raw_inbox/ so tests and oracles see one frozen
corpus.
"""

from __future__ import annotations

import json
import random
from pathlib import Path

INBOX_DIR = Path(__file__).resolve().parents[2] / "data" / "raw_inbox"
DATES = ("2025-07-18", "2025-07-19", "2025-07-20")
N_PER_DAY = 50
N_SONGS, N_ALBUMS, N_ARTISTS = 120, 40, 30
# song_0000 appears every day -> stable Q4 point-lookup target
PINNED_SONG = 0


def _gen() -> dict[str, str]:
    rng = random.Random(20250718)
    artists = [
        {
            "id": f"artist_{i:04d}",
            "name": f"Artist {i}",
            "href": f"https://api.spotify.example/v1/artists/artist_{i:04d}",
        }
        for i in range(N_ARTISTS)
    ]
    albums = []
    for i in range(N_ALBUMS):
        style = i % 3  # mixed release_date precision, D3
        rel = (
            f"{1990 + i % 30}"
            if style == 0
            else f"{1990 + i % 30}-{1 + i % 12:02d}"
            if style == 1
            else f"{1990 + i % 30}-{1 + i % 12:02d}-{1 + i % 28:02d}"
        )
        albums.append(
            {
                "id": f"album_{i:04d}",
                "name": f"Album {i}",
                "release_date": None if i == 13 else rel,  # one null
                "total_tracks": 6 + i % 15,
                "external_urls": {
                    "spotify": f"https://open.spotify.example/album/album_{i:04d}"
                },
                "artists": [artists[i % N_ARTISTS]],
            }
        )
    songs = []
    for i in range(N_SONGS):
        n_art = 1 + rng.randrange(3)  # multi-artist tracks, P2
        track_artists = [artists[(i + k * 7) % N_ARTISTS] for k in range(n_art)]
        songs.append(
            {
                "id": f"song_{i:04d}",
                "name": f"Song {i}",
                "popularity": rng.randrange(101),
                "duration_ms": 90_000 + rng.randrange(240_000),
                "external_urls": {
                    "spotify": f"https://open.spotify.example/track/song_{i:04d}"
                },
                "album": albums[i % N_ALBUMS],
                "artists": track_artists,
            }
        )

    out: dict[str, str] = {}
    for d_idx, date in enumerate(DATES):
        pool = [s for s in range(N_SONGS) if s != PINNED_SONG]
        picks = [PINNED_SONG] + rng.sample(pool, N_PER_DAY - 1)
        rng.shuffle(picks)  # rank churn across days
        items = [
            {
                "added_at": f"{date}T{6 + (pos % 12):02d}:{pos % 60:02d}:00Z",
                "track": songs[s],
            }
            for pos, s in enumerate(picks)
        ]
        out[f"spotify_raw_{date}.json"] = json.dumps(
            {"tracks": {"items": items}}, separators=(",", ":")
        )
    return out


def write_inbox(dest: Path = INBOX_DIR) -> list[Path]:
    dest.mkdir(parents=True, exist_ok=True)
    paths = []
    for name, body in _gen().items():
        p = dest / name
        p.write_text(body + "\n")
        paths.append(p)
    return paths


if __name__ == "__main__":
    for p in write_inbox():
        print(p)
