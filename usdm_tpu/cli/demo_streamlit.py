"""Streamlit web demo (equivalent of /root/reference/src/streamlit_demo.py).

Run with:  streamlit run usdm_tpu/cli/demo_streamlit.py -- \
              --model_dir ... --xlsr_dir ... --kmeans ... \
              --voicebox_dir ... --bigvgan_dir ... [--demo]

Upload user speech (+ optional reference speaker audio), tune sampling
parameters, and play the spoken response.  The compute path is identical to
the CLI: XLS-R units -> 3-stage constrained decode -> Voicebox -> BigVGAN.
If streamlit isn't installed, use `python -m usdm_tpu.cli.serve` (stdlib HTTP
server) instead.
"""

from __future__ import annotations

import argparse
import io
import sys


def _build_pipeline(args):
    from usdm_tpu.pipeline import UsdmPipeline

    if args.demo:
        return UsdmPipeline.tiny_random()
    return UsdmPipeline.from_pretrained(
        args.model_dir, args.xlsr_dir, args.kmeans, args.voicebox_dir,
        args.bigvgan_dir, args.tokenizer_dir,
    )


def main() -> int:
    try:
        import streamlit as st
    except ImportError:
        print("streamlit is not installed; use `python -m usdm_tpu.cli.serve` "
              "for the dependency-free HTTP demo.", file=sys.stderr)
        return 1

    import numpy as np


    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir")
    parser.add_argument("--xlsr_dir")
    parser.add_argument("--kmeans")
    parser.add_argument("--voicebox_dir")
    parser.add_argument("--bigvgan_dir")
    parser.add_argument("--tokenizer_dir")
    parser.add_argument("--demo", action="store_true")
    args, _ = parser.parse_known_args()

    st.title("USDM-TPU spoken dialog demo")

    @st.cache_resource
    def load():
        pipe = _build_pipeline(args)
        # serve through the continuous-batching engine, like the reference
        # demo serves through vLLM (streamlit_demo.py:64)
        return pipe, pipe.make_server()

    pipe, engine_server = load()

    user_file = st.file_uploader("User speech (wav)", type=["wav"])
    ref_file = st.file_uploader("Reference speaker audio (optional)", type=["wav"])
    n_steps = st.slider("ODE timesteps", 2, 50, 15)  # demo default 15 (streamlit_demo.py:205)
    top_k = st.slider("top_k (1 = greedy)", 1, 100, 1)
    top_p = st.slider("top_p", 0.1, 1.0, 1.0)
    temperature = st.slider("temperature", 0.1, 2.0, 1.0)
    seed = st.number_input("Seed", value=0)

    if user_file is not None and st.button("Respond"):
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
            f.write(user_file.read())
            user_path = f.name
        ref_path = None
        if ref_file is not None:
            with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                f.write(ref_file.read())
                ref_path = f.name

        from usdm_tpu.engine.server import PagedDialogPolicy

        policy = PagedDialogPolicy(
            engine_server, pipe.tokenizer, max_new_tokens=pipe.max_new_tokens,
            top_k=int(top_k), top_p=float(top_p),
            temperature=float(temperature), seed=int(seed),
        )
        with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as out:
            result = pipe.respond_with_policy(policy, user_path, out.name,
                                              ref_path, n_timesteps=int(n_steps),
                                              seed=int(seed))
            st.markdown(f"**User said:** {result.user_text}")
            st.markdown(f"**Agent:** {result.agent_text}")
            if result.agent_units:
                st.audio(out.name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
