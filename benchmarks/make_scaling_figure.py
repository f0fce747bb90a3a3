"""Render docs/figures/study_scaling.png — the round-5 single-chip
batched-study scaling curve (throughput vs batch size, unchunked vmap vs
BatchedStudy(chunk=1024)).

Data are the measured v5e numbers of record from benchmarks/RESULTS.md
"Round 5: single-chip batched-study scaling curve" (B=256/512 from the
r5_study_scaling session; B>=1024 from the uncontended re-run; chunked
rows from the chunk=1024 measurement).  Re-measure with
benchmarks/r5_study_scaling.py [--chunk 1024] before regenerating if the
stack's numerics change.

Usage: python benchmarks/make_scaling_figure.py
"""

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

# categorical slots 1 (blue) and 2 (orange) of the validated palette
BLUE, ORANGE = "#2a78d6", "#eb6834"
INK, MUTED = "#1a1a19", "#6b6a62"

B = [256, 512, 1024, 2048, 4096]
PLAIN = [102_676, 128_219, 131_952, 110_992, 109_592]
# chunk=1024 is identical below/at the chunk size; measured above it
B_CHUNK = [1024, 2048, 4096]
CHUNK = [131_952, 130_176, 130_052]


def main(out="docs/figures/study_scaling.png"):
    fig, ax = plt.subplots(figsize=(7.2, 3.9), dpi=160)
    ax.plot(B, [v / 1e3 for v in PLAIN], color=BLUE, lw=2,
            marker="o", ms=6, label="plain vmap", zorder=3)
    ax.plot(B_CHUNK, [v / 1e3 for v in CHUNK], color=ORANGE, lw=2,
            marker="o", ms=6, label="chunk=1024 (lax.map of vmaps)",
            zorder=3)
    # direct labels at the line ends, in ink (identity also in the legend)
    ax.annotate("plain vmap", (B[-1], PLAIN[-1] / 1e3), xytext=(8, -4),
                textcoords="offset points", color=INK, fontsize=9)
    ax.annotate("chunk=1024", (B_CHUNK[-1], CHUNK[-1] / 1e3),
                xytext=(8, -4), textcoords="offset points", color=INK,
                fontsize=9)
    ax.annotate("single-chip knee", (1024, 131.952), xytext=(0, 10),
                textcoords="offset points", ha="center", color=MUTED,
                fontsize=9)

    ax.set_xscale("log", base=2)
    ax.set_xticks(B)
    ax.set_xticklabels([str(b) for b in B])
    ax.set_xlim(220, 5600)
    ax.set_ylim(95, 142)
    ax.set_xlabel("batch size B (rollouts)", color=INK)
    ax.set_ylabel("throughput (k rollout-solves/s)", color=INK)
    ax.set_title("Batched-study throughput vs batch size — TPU v5e, "
                 "one chip (bench config 5)", color=INK, fontsize=11)
    ax.grid(True, axis="y", color="#e4e3dd", lw=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=9)
    ax.legend(frameon=False, loc="lower left", fontsize=9)
    fig.tight_layout()
    fig.savefig(out, facecolor="white")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
