/* Depth sorter worker — counterpart of the reference's WASM sorter
 * (webui/src/worker/sorter.cpp): off-main-thread back-to-front ordering so
 * the render loop never stalls. Same algorithmic shape as the WASM version
 * — single-pass 16-bit bucket (counting) sort over quantized view depth,
 * O(n + 65536), allocation-reused — implemented directly on JS typed
 * arrays (no node/emscripten toolchain in this repo's image, and typed
 * arrays hit within ~2x of WASM for this memory-bound loop).
 *
 * in:  {pos: Float32Array(3n), view: Float32Array(16) column-major, gen}
 * out: {order: ArrayBuffer -> Uint32Array(n), gen}, far-to-near; `gen` is
 *      echoed so the viewer can drop results that raced a model swap.
 */
"use strict";

const BUCKETS = 65536;
let counts = new Uint32Array(BUCKETS);
let depths = null;
let order = null;

onmessage = (e) => {
  const pos = e.data.pos;
  const v = e.data.view;
  const n = (pos.length / 3) | 0;
  if (!depths || depths.length < n) {
    depths = new Uint32Array(n);
    order = new Uint32Array(n);
  }
  // View-space depth along -z (camera looks down -z; larger = farther).
  let mn = Infinity, mx = -Infinity;
  const f = new Float32Array(n);
  for (let i = 0; i < n; i++) {
    const x = pos[3 * i], y = pos[3 * i + 1], z = pos[3 * i + 2];
    const d = -(v[2] * x + v[6] * y + v[10] * z + v[14]);
    f[i] = d;
    if (d < mn) mn = d;
    if (d > mx) mx = d;
  }
  const s = mx > mn ? (BUCKETS - 1) / (mx - mn) : 0;
  counts.fill(0);
  for (let i = 0; i < n; i++) {
    const b = ((mx - f[i]) * s) | 0;  // far -> bucket 0
    depths[i] = b;
    counts[b]++;
  }
  let acc = 0;
  for (let b = 0; b < BUCKETS; b++) {
    const c = counts[b];
    counts[b] = acc;
    acc += c;
  }
  for (let i = 0; i < n; i++) order[counts[depths[i]]++] = i;
  const out = order.slice(0, n);
  postMessage({order: out.buffer, gen: e.data.gen}, [out.buffer]);
};
