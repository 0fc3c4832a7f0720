"""Build the Rust reference (caba5/WebGraph) for cross-implementation
interop tests — offline.

The sandbox has cargo/rustc but no network, so the reference's
crates.io dependencies are unreachable. Every dependency sits on a code
path the interop tests don't need (clap argument parsing, serde/bincode
AsciiGraph caching, sucds Elias-Fano behind --ef, rand perf queries),
so this script:

1. copies /root/reference into a scratch build dir (the reference tree
   itself is read-only and is never modified),
2. swaps the deps for the signature-compatible offline shims in
   vendor/ (path dependencies),
3. strips the clap/serde derive attributes and appends hand-rolled
   `Args::parse()` impls that accept the same positionals (defaults
   pinned to the reference's own default values: w=7, r=3, i=4, k=3),
4. `cargo build --release --offline`.

The PATCHES are plumbing only — argument parsing and disabled caching.
Every encoder/decoder line of the reference compiles and runs as-is;
that is the point: the binaries exercised by tests/test_reference_interop.py
are the reference's real codecs.

Usage: python scripts/build_reference.py [--force]  (or import build())
Prints the bin directory on success.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REF_DIR = os.environ.get("WGS_REFERENCE_DIR", "/root/reference")
BUILD_DIR = os.environ.get("WGS_INTEROP_BUILD_DIR", "/tmp/wgs_interop_build")

# bump when patches change so stale builds rebuild
PATCH_VERSION = "3"

BINS = [
    "webgraph_rust",  # main.rs: BV compress (+ -c equality check)
    "decompress_to_ascii",
    "compress_huff",
    "decompress_huff",
    "compress_zuckerli",
    "decompress_zuckerli",
]

CARGO_TOML = """\
[package]
name = "webgraph_rust"
version = "0.1.0"
edition = "2021"

[dependencies]
serde = { path = "vendor/serde" }
bincode = { path = "vendor/bincode" }
num-traits = { path = "vendor/num-traits" }
sucds = { path = "vendor/sucds" }
rand = { path = "vendor/rand" }
java-properties = { path = "vendor/java-properties" }

[workspace]
"""

# two-positional parsers (the reference's defaults pinned)
_PARSE_SRC_DEST = """
impl Args {
    fn parse() -> Args {
        let a: Vec<String> = std::env::args().skip(1).collect();
        assert!(a.len() == 2, "usage: <source_basename> <dest_basename>");
        Args {
            window_size: 7,
            max_ref_count: 3,
            min_interval_length: 4,
            zeta_k: 3,
            source_name: a[0].clone(),
            dest_name: a[1].clone(),
        }
    }
}
"""

_PARSE_TO_ASCII = """
impl Args {
    fn parse() -> Args {
        let a: Vec<String> = std::env::args().skip(1).collect();
        assert!(a.len() == 2, "usage: <source_basename> <dest_basename>");
        Args { source_name: a[0].clone(), dest_name: a[1].clone() }
    }
}
"""

_PARSE_ZUCK_IN = """
impl Args {
    fn parse() -> Args {
        let mut pos: Vec<String> = Vec::new();
        let mut perf = false;
        for a in std::env::args().skip(1) {
            if a == "-p" || a == "--perf" { perf = true; } else { pos.push(a); }
        }
        Args {
            window_size: 7,
            max_ref_count: 3,
            min_interval_length: 4,
            zeta_k: 3,
            source_name: pos[0].clone(),
            dest_name: pos.get(1).cloned(),
            perf_test: perf,
        }
    }
}
"""

_PARSE_MAIN = """
impl WGArgs {
    fn parse() -> WGArgs {
        let mut pos: Vec<String> = Vec::new();
        let (mut check, mut perf, mut from_plain, mut ef) =
            (false, false, false, false);
        for a in std::env::args().skip(1) {
            match a.as_str() {
                "-c" | "--check" => check = true,
                "-p" | "--perf" => perf = true,
                "-a" | "--ascii" => from_plain = true,
                "--ef" => ef = true,
                _ => pos.push(a),
            }
        }
        WGArgs {
            window_size: 7,
            max_ref_count: 3,
            min_interval_length: 4,
            block_coding: EncodingType::GAMMA,
            block_count_coding: EncodingType::GAMMA,
            outdegree_coding: EncodingType::GAMMA,
            offset_coding: EncodingType::GAMMA,
            reference_coding: EncodingType::UNARY,
            interval_coding: EncodingType::GAMMA,
            residual_coding: EncodingType::ZETA,
            zeta_k: 3,
            elias_fano: ef,
            source_name: pos[0].clone(),
            dest_name: pos.get(1).cloned(),
            check,
            perf_test: perf,
            from_plain,
        }
    }
}
"""


def _strip_clap(src: str) -> str:
    """Drop clap import and attribute lines (all single-line in the
    reference); doc comments and field declarations stay untouched."""
    out = []
    for line in src.splitlines(keepends=True):
        t = line.strip()
        if t == "use clap::Parser;":
            continue
        if t.startswith("#[derive(Parser"):
            continue
        if t.startswith("#[command(") or t.startswith("#[arg("):
            continue
        out.append(line)
    return "".join(out)


def _patch_file(path: str, transform) -> None:
    with open(path) as f:
        src = f.read()
    patched = transform(src)
    with open(path, "w") as f:
        f.write(patched)


def _replace_once(src: str, old: str, new: str, label: str) -> str:
    n = src.count(old)
    if n != 1:
        raise RuntimeError(
            f"interop patch {label!r}: expected 1 occurrence, found {n} — "
            "the reference tree changed; update build_reference.py"
        )
    return src.replace(old, new)


def build(force: bool = False) -> str:
    """Patch + build; returns the release bin directory."""
    stamp = os.path.join(BUILD_DIR, ".interop_patch_version")
    bin_dir = os.path.join(BUILD_DIR, "target", "release")
    if not force and os.path.exists(stamp):
        with open(stamp) as f:
            if f.read().strip() == PATCH_VERSION and all(
                os.path.exists(os.path.join(bin_dir, b)) for b in BINS
            ):
                return bin_dir

    if os.path.exists(BUILD_DIR):
        shutil.rmtree(BUILD_DIR)
    shutil.copytree(
        REF_DIR,
        BUILD_DIR,
        ignore=shutil.ignore_patterns(
            "experiments", "target", ".git", "Cargo.lock"
        ),
    )
    shutil.copytree(
        os.path.join(HERE, "vendor"), os.path.join(BUILD_DIR, "vendor")
    )

    with open(os.path.join(BUILD_DIR, "Cargo.toml"), "w") as f:
        f.write(CARGO_TOML)

    src = lambda *p: os.path.join(BUILD_DIR, "src", *p)

    # not needed by the interop tests; avoids patching one more clap user
    os.unlink(src("bin", "generate_offsets.rs"))

    _patch_file(
        src("utils", "mod.rs"),
        lambda s: _replace_once(
            _replace_once(
                _replace_once(
                    s, "use clap::ValueEnum;\n", "", "utils clap import"
                ),
                "use serde::{Serialize, Deserialize};\n",
                "",
                "utils serde import",
            ),
            "#[derive(Clone, Copy, Eq, PartialEq, Serialize, Deserialize,"
            " Debug, ValueEnum)]",
            "#[derive(Clone, Copy, Eq, PartialEq, Debug)]",
            "EncodingType derive",
        ),
    )

    _patch_file(
        src("ascii_graph", "mod.rs"),
        lambda s: _replace_once(
            _replace_once(
                s,
                "#[derive(Serialize, Deserialize, Clone)]",
                "#[derive(Clone)]",
                "AsciiGraph derive",
            ),
            "#[derive(Serialize, Deserialize)]\n",
            "",
            "AsciiGraphBuilder derive",
        ),
    )

    for name, impl_src in [
        ("decompress_to_ascii.rs", _PARSE_TO_ASCII),
        ("compress_huff.rs", _PARSE_SRC_DEST),
        ("decompress_huff.rs", _PARSE_SRC_DEST),
        ("compress_zuckerli.rs", _PARSE_SRC_DEST),
        ("decompress_zuckerli.rs", _PARSE_ZUCK_IN),
    ]:
        _patch_file(
            src("bin", name), lambda s, i=impl_src: _strip_clap(s) + i
        )

    _patch_file(src("main.rs"), lambda s: _strip_clap(s) + _PARSE_MAIN)

    env = dict(os.environ)
    env["CARGO_NET_OFFLINE"] = "true"
    proc = subprocess.run(
        ["cargo", "build", "--release", "--offline"],
        cwd=BUILD_DIR,
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"cargo build failed:\n{proc.stdout[-4000:]}\n{proc.stderr[-8000:]}"
        )
    with open(stamp, "w") as f:
        f.write(PATCH_VERSION)
    return bin_dir


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
