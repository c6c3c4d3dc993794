/* dogs_tpu splat viewer — self-contained WebGL2 renderer for the
 * antimatter15 .splat format the framework exports
 * (dogs_tpu/fields/io.py save_splat: 32 B/record =
 *  [pos 3xf32 | scale 3xf32 | rgba 4xu8 | quat 4xu8]).
 *
 * Counterpart of the reference's three.js viewer stack
 * (webui/src/Viewer.js + splatmesh/SplatMesh.js), written fresh and
 * dependency-free: each splat is an instanced screen-space quad whose
 * vertex shader projects the 3D covariance (from quat+scale) through the
 * EWA 2x2 screen covariance, and whose fragment shader evaluates the
 * Gaussian falloff. Depth ordering comes from sorter.worker.js.
 */
"use strict";

const VS = `#version 300 es
precision highp float;
layout(location=0) in vec2 corner;        // quad corner in [-2, 2]
layout(location=1) in vec3 i_pos;
layout(location=2) in vec3 i_scale;
layout(location=3) in vec4 i_rgba;        // 0..1
layout(location=4) in vec4 i_quat;        // -1..1, (w x y z) normalized-ish
uniform mat4 u_view;
uniform mat4 u_proj;
uniform vec2 u_focal;                     // fx, fy in pixels
uniform vec2 u_viewport;                  // w, h in pixels
out vec4 v_rgba;
out vec2 v_xy;                            // position in splat-local units

void main() {
  vec4 cam = u_view * vec4(i_pos, 1.0);
  if (cam.z >= -0.05) { gl_Position = vec4(0., 0., 2., 1.); return; }

  // R from quaternion, V = R S S^T R^T. The attribute arrives as
  // normalized UNSIGNED_BYTE in [0,1]; records store q*128+128, so remap
  // to [-1,1] before normalizing.
  vec4 q = normalize(i_quat * 2.0 - 1.0);
  float w = q.x, x = q.y, y = q.z, z = q.w;
  mat3 R = mat3(
    1.-2.*(y*y+z*z), 2.*(x*y+w*z),   2.*(x*z-w*y),
    2.*(x*y-w*z),    1.-2.*(x*x+z*z),2.*(y*z+w*x),
    2.*(x*z+w*y),    2.*(y*z-w*x),   1.-2.*(x*x+y*y));
  mat3 S = mat3(i_scale.x,0.,0., 0.,i_scale.y,0., 0.,0.,i_scale.z);
  mat3 M = R * S;
  mat3 V = M * transpose(M);

  // EWA: J W V W^T J^T (world->camera rotation W from u_view).
  mat3 W = mat3(u_view);
  float iz = 1.0 / -cam.z;
  // Camera looks down -z; use standard pinhole jacobian on (x, y, -z).
  float tx = cam.x * iz, ty = cam.y * iz;
  mat3 J = mat3(
    u_focal.x*iz, 0.,           0.,
    0.,           u_focal.y*iz, 0.,
    -u_focal.x*tx*iz, -u_focal.y*ty*iz, 0.);
  mat3 T = J * W;
  mat3 C = T * V * transpose(T);
  float a = C[0][0] + 0.3, b = C[0][1], d = C[1][1] + 0.3;  // low-pass

  // Principal axes of the 2x2 covariance for the quad basis.
  float mid = 0.5 * (a + d);
  float rad = sqrt(max(1e-9, mid * mid - (a * d - b * b)));
  float l1 = mid + rad, l2 = max(mid - rad, 1e-9);
  vec2 e1 = normalize(vec2(b, l1 - a));
  if (abs(b) < 1e-9) e1 = (a >= d) ? vec2(1., 0.) : vec2(0., 1.);
  vec2 e2 = vec2(-e1.y, e1.x);
  float r1 = sqrt(l1), r2 = sqrt(l2);
  if (r1 > 1024.0) { gl_Position = vec4(0., 0., 2., 1.); return; }

  vec2 px = corner.x * r1 * e1 + corner.y * r2 * e2;  // pixel offset
  vec4 clip = u_proj * cam;
  vec2 ndc = clip.xy / clip.w + px * 2.0 / u_viewport;
  gl_Position = vec4(ndc * clip.w, clip.z, clip.w);
  v_rgba = i_rgba;
  v_xy = corner;
}`;

const FS = `#version 300 es
precision highp float;
in vec4 v_rgba;
in vec2 v_xy;
out vec4 frag;
void main() {
  // v_xy is in sigma units (quad corners sit at 2 sigma).
  float alpha = v_rgba.a * exp(-0.5 * dot(v_xy, v_xy));
  if (alpha < 1.0/255.0) discard;
  frag = vec4(v_rgba.rgb * alpha, alpha);  // premultiplied, back-to-front
}`;

export class SplatViewer {
  constructor(canvas) {
    this.canvas = canvas;
    const gl = canvas.getContext("webgl2", {antialias: false, alpha: false});
    if (!gl) throw new Error("WebGL2 required");
    this.gl = gl;
    this.count = 0;
    this.camera = {theta: 0.4, phi: -0.6, dist: 6, target: [0, 0, 0],
                  fovy: 50 * Math.PI / 180};
    this._program();
    this._quad();
    this.sorter = new Worker("/static/sorter.worker.js");
    this.sorter.onmessage = (e) => this._applyOrder(e.data);
    this._sortPending = false;
    this._gen = 0;  // bumped per setData; stale sort results are dropped
    this._controls();
  }

  _program() {
    const gl = this.gl;
    const mk = (type, src) => {
      const s = gl.createShader(type);
      gl.shaderSource(s, src);
      gl.compileShader(s);
      if (!gl.getShaderParameter(s, gl.COMPILE_STATUS))
        throw new Error(gl.getShaderInfoLog(s));
      return s;
    };
    const p = gl.createProgram();
    gl.attachShader(p, mk(gl.VERTEX_SHADER, VS));
    gl.attachShader(p, mk(gl.FRAGMENT_SHADER, FS));
    gl.linkProgram(p);
    if (!gl.getProgramParameter(p, gl.LINK_STATUS))
      throw new Error(gl.getProgramInfoLog(p));
    this.prog = p;
    this.u = {
      view: gl.getUniformLocation(p, "u_view"),
      proj: gl.getUniformLocation(p, "u_proj"),
      focal: gl.getUniformLocation(p, "u_focal"),
      viewport: gl.getUniformLocation(p, "u_viewport"),
    };
  }

  _quad() {
    const gl = this.gl;
    this.vao = gl.createVertexArray();
    gl.bindVertexArray(this.vao);
    const corners = new Float32Array([-2,-2, 2,-2, -2,2, 2,2]);
    const cb = gl.createBuffer();
    gl.bindBuffer(gl.ARRAY_BUFFER, cb);
    gl.bufferData(gl.ARRAY_BUFFER, corners, gl.STATIC_DRAW);
    gl.enableVertexAttribArray(0);
    gl.vertexAttribPointer(0, 2, gl.FLOAT, false, 0, 0);
    this.instanceBuf = gl.createBuffer();  // interleaved sorted records
  }

  /* data: ArrayBuffer of 32-byte splat records (possibly a progressive
   * prefix — exports are importance-sorted so prefixes are viewable), OR a
   * standard 3DGS .ply (detected by magic, converted in plyToSplat), OR a
   * GaussianSplats3D .ksplat (detected by the `name` hint / structural
   * sniff, converted in ksplatToSplat). */
  setData(data, name) {
    const m = new Uint8Array(data, 0, Math.min(4, data.byteLength));
    if (m[0] === 112 && m[1] === 108 && m[2] === 121) data = plyToSplat(data);
    else if ((name && name.endsWith(".ksplat")) || sniffKsplat(data))
      data = ksplatToSplat(data);
    this.raw = new Uint8Array(data.slice(0, data.byteLength & ~31));
    this.count = this.raw.byteLength >> 5;
    const f = new Float32Array(this.raw.buffer, 0, this.count * 8);
    // Deinterleave once into typed arrays the sorter + GL path share.
    this.pos = new Float32Array(this.count * 3);
    this.scale = new Float32Array(this.count * 3);
    this.rgba = new Uint8Array(this.count * 4);
    this.quat = new Uint8Array(this.count * 4);
    for (let i = 0; i < this.count; i++) {
      for (let k = 0; k < 3; k++) {
        this.pos[i * 3 + k] = f[i * 8 + k];
        this.scale[i * 3 + k] = f[i * 8 + 3 + k];
      }
      for (let k = 0; k < 4; k++) {
        this.rgba[i * 4 + k] = this.raw[i * 32 + 24 + k];
        this.quat[i * 4 + k] = this.raw[i * 32 + 28 + k];
      }
    }
    this.order = new Uint32Array(this.count);
    for (let i = 0; i < this.count; i++) this.order[i] = i;
    this._gen++;
    this._sortPending = false;  // any in-flight sort is for the old model
    this._uploadSorted();
    this.requestSort();
  }

  _uploadSorted() {
    // Interleave in sorted order: [pos3f | scale3f | rgba4b | quat4b] = 32 B.
    const gl = this.gl, n = this.count;
    const buf = new ArrayBuffer(n * 32);
    const fv = new Float32Array(buf), bv = new Uint8Array(buf);
    for (let j = 0; j < n; j++) {
      const i = this.order[j];
      for (let k = 0; k < 3; k++) {
        fv[j * 8 + k] = this.pos[i * 3 + k];
        fv[j * 8 + 3 + k] = this.scale[i * 3 + k];
      }
      for (let k = 0; k < 4; k++) {
        bv[j * 32 + 24 + k] = this.rgba[i * 4 + k];
        bv[j * 32 + 28 + k] = this.quat[i * 4 + k];
      }
    }
    gl.bindVertexArray(this.vao);
    gl.bindBuffer(gl.ARRAY_BUFFER, this.instanceBuf);
    gl.bufferData(gl.ARRAY_BUFFER, buf, gl.DYNAMIC_DRAW);
    const attr = (loc, size, type, norm, off) => {
      gl.enableVertexAttribArray(loc);
      gl.vertexAttribPointer(loc, size, type, norm, 32, off);
      gl.vertexAttribDivisor(loc, 1);
    };
    attr(1, 3, gl.FLOAT, false, 0);
    attr(2, 3, gl.FLOAT, false, 12);
    attr(3, 4, gl.UNSIGNED_BYTE, true, 24);
    attr(4, 4, gl.UNSIGNED_BYTE, true, 28);  // maps 0..255 -> 0..1
  }

  _applyOrder(msg) {
    if (msg.gen !== this._gen) return;  // raced a model swap — drop it
    this.order = new Uint32Array(msg.order);
    this._sortPending = false;
    this._uploadSorted();
    this.draw();
  }

  requestSort() {
    if (this._sortPending || !this.count) return;
    this._sortPending = true;
    this.sorter.postMessage({
      pos: this.pos, view: this.viewMatrix(), gen: this._gen,
    });
  }

  viewMatrix() {
    const c = this.camera;
    const eye = [
      c.target[0] + c.dist * Math.cos(c.phi) * Math.sin(c.theta),
      c.target[1] + c.dist * Math.sin(c.phi),
      c.target[2] + c.dist * Math.cos(c.phi) * Math.cos(c.theta),
    ];
    return lookAt(eye, c.target, [0, -1, 0]);  // COLMAP-style y-down worlds
  }

  draw() {
    const gl = this.gl, w = this.canvas.width, h = this.canvas.height;
    gl.viewport(0, 0, w, h);
    gl.clearColor(0.04, 0.04, 0.06, 1);
    gl.clear(gl.COLOR_BUFFER_BIT);
    if (!this.count) return;
    gl.disable(gl.DEPTH_TEST);
    gl.enable(gl.BLEND);
    // Premultiplied back-to-front "over".
    gl.blendFunc(gl.ONE, gl.ONE_MINUS_SRC_ALPHA);
    gl.useProgram(this.prog);
    const fovy = this.camera.fovy;
    const fy = 0.5 * h / Math.tan(0.5 * fovy), fx = fy;
    gl.uniformMatrix4fv(this.u.view, false, this.viewMatrix());
    gl.uniformMatrix4fv(this.u.proj, false, perspective(fovy, w / h, 0.05, 1000));
    gl.uniform2f(this.u.focal, fx, fy);
    gl.uniform2f(this.u.viewport, w, h);
    gl.bindVertexArray(this.vao);
    gl.drawArraysInstanced(gl.TRIANGLE_STRIP, 0, 4, this.count);
  }

  _controls() {
    const cv = this.canvas;
    let drag = null;
    cv.addEventListener("pointerdown", (e) => {
      drag = {x: e.clientX, y: e.clientY, b: e.button};
      cv.setPointerCapture(e.pointerId);
    });
    cv.addEventListener("pointermove", (e) => {
      if (!drag) return;
      const dx = e.clientX - drag.x, dy = e.clientY - drag.y;
      drag.x = e.clientX; drag.y = e.clientY;
      const c = this.camera;
      if (drag.b === 0) {
        c.theta -= dx * 0.005;
        c.phi = Math.min(1.5, Math.max(-1.5, c.phi - dy * 0.005));
      } else {
        const s = c.dist * 0.0015;
        c.target[0] -= dx * s * Math.cos(c.theta);
        c.target[2] += dx * s * Math.sin(c.theta);
        c.target[1] += dy * s;
      }
      this.draw(); this.requestSort();
    });
    cv.addEventListener("pointerup", () => { drag = null; });
    cv.addEventListener("wheel", (e) => {
      e.preventDefault();
      this.camera.dist *= Math.exp(e.deltaY * 0.001);
      this.draw(); this.requestSort();
    }, {passive: false});
    cv.addEventListener("contextmenu", (e) => e.preventDefault());
  }
}

/* -- 3DGS .ply ingestion --------------------------------------------------
 * Converts the standard 3DGS ply layout the exporter writes
 * (dogs_tpu/fields/io.py save_gaussian_ply: x y z nx ny nz f_dc_* f_rest_*
 * opacity scale_* rot_*) into the viewer's 32-byte splat records, matching
 * save_splat's activations: scale=exp, opacity=sigmoid, rgb=0.5+C0*f_dc,
 * quat normalized then *128+128. Counterpart of the reference viewer's
 * PlyLoader (webui/src/loaders/PlyLoader.js); SH rest bands are dropped —
 * the .splat record is degree-0 by design. */
export function plyToSplat(data) {
  const headBytes = new Uint8Array(data, 0, Math.min(data.byteLength, 65536));
  const headText = new TextDecoder().decode(headBytes);
  const endTag = "end_header\n";
  const hEnd = headText.indexOf(endTag);
  if (hEnd < 0) throw new Error("ply: header end not found");
  const header = headText.slice(0, hEnd);
  if (!/format binary_little_endian/.test(header))
    throw new Error("ply: only binary_little_endian supported");
  let n = 0;
  const props = [];
  for (const ln of header.split("\n")) {
    const mv = ln.match(/^element vertex (\d+)/);
    if (mv) n = parseInt(mv[1], 10);
    const mp = ln.match(/^property (\w+) (\S+)/);
    if (mp) props.push([mp[1], mp[2]]);
  }
  const SIZE = {float: 4, float32: 4, double: 8, uchar: 1, uint8: 1,
                char: 1, int8: 1, short: 2, ushort: 2, int: 4, uint: 4};
  const field = {};
  let stride = 0;
  for (const [type, name] of props) {
    if (!(type in SIZE)) throw new Error(`ply: unsupported type ${type}`);
    field[name] = {off: stride, type};
    stride += SIZE[type];
  }
  const dv = new DataView(data, hEnd + endTag.length);
  const get = (name, i) => {
    const f = field[name];
    if (!f) return 0;
    const o = i * stride + f.off;
    switch (f.type) {
      case "float": case "float32": return dv.getFloat32(o, true);
      case "double": return dv.getFloat64(o, true);
      case "uchar": case "uint8": return dv.getUint8(o);
      case "char": case "int8": return dv.getInt8(o);
      case "short": return dv.getInt16(o, true);
      case "ushort": return dv.getUint16(o, true);
      case "uint": return dv.getUint32(o, true);
      default: return dv.getInt32(o, true);
    }
  };
  const C0 = 0.28209479177387814;
  const out = new ArrayBuffer(n * 32);
  const fv = new Float32Array(out), bv = new Uint8Array(out);
  const clamp255 = (x) => Math.max(0, Math.min(255, Math.round(x)));
  for (let i = 0; i < n; i++) {
    fv[i * 8] = get("x", i);
    fv[i * 8 + 1] = get("y", i);
    fv[i * 8 + 2] = get("z", i);
    for (let k = 0; k < 3; k++) {
      fv[i * 8 + 3 + k] = Math.exp(get("scale_" + k, i));
      bv[i * 32 + 24 + k] = clamp255((0.5 + C0 * get("f_dc_" + k, i)) * 255);
    }
    bv[i * 32 + 27] = clamp255(255 / (1 + Math.exp(-get("opacity", i))));
    const q = [get("rot_0", i), get("rot_1", i),
               get("rot_2", i), get("rot_3", i)];
    const l = Math.hypot(q[0], q[1], q[2], q[3]) || 1;
    for (let k = 0; k < 4; k++)
      bv[i * 32 + 28 + k] = clamp255((q[k] / l) * 128 + 128);
  }
  return out;
}

/* -- .ksplat ingestion ----------------------------------------------------
 * GaussianSplats3D container format (reference webui/src/loaders/ksplat/
 * KSplatLoader.js + SplatBuffer.js): 4096-byte file header, maxSectionCount
 * x 1024-byte section headers, then per-section [partial-bucket lengths |
 * bucket centers | splat records]. Three compression levels: 0 = f32
 * center/scale/rotation; 1 = uint16 bucket-relative centers + half-float
 * scale/rotation; 2 = level 1 with uint8 SH. Decodes to the viewer's
 * 32-byte degree-0 records (SH bands beyond DC are dropped, like the .ply
 * path). Color is stored post-activation RGBA u8 in all levels. */
const KSPLAT_LV = {
  0: {scaleOff: 12, colorOff: 40, scaleRange: 1,
      bytes: (c) => 12 + 12 + 16 + 4 + 4 * c},
  1: {scaleOff: 6, colorOff: 20, scaleRange: 32767,
      bytes: (c) => 6 + 6 + 8 + 4 + 2 * c},
  2: {scaleOff: 6, colorOff: 20, scaleRange: 32767,
      bytes: (c) => 6 + 6 + 8 + 4 + 1 * c},
};

function sniffKsplat(data) {
  if (data.byteLength < 4096 + 1024) return false;
  const u8 = new Uint8Array(data, 0, 24);
  const u32 = new Uint32Array(data, 0, 6);
  const u16 = new Uint16Array(data, 0, 12);
  const lvl = u16[10];
  // version 0.x, sane section/splat counts, known compression level.
  return u8[0] === 0 && u8[1] >= 1 && u32[1] > 0 && u32[1] <= 1024 &&
         u32[2] > 0 && u32[2] <= u32[1] && u32[4] > 0 && lvl <= 2;
}

function halfToFloat(h) {
  const s = (h & 0x8000) ? -1 : 1, e = (h >> 10) & 0x1f, m = h & 0x3ff;
  if (e === 0) return s * m * 2 ** -24;
  if (e === 31) return m ? NaN : s * Infinity;
  return s * (1 + m / 1024) * 2 ** (e - 15);
}

export function ksplatToSplat(data) {
  const u16 = new Uint16Array(data, 0, 2048);
  const u32 = new Uint32Array(data, 0, 1024);
  const maxSections = u32[1];
  const sections = u32[2];
  const totalSplats = u32[4];
  const lvl = u16[10];
  const L = KSPLAT_LV[lvl];
  if (!L) throw new Error(`ksplat: unknown compression level ${lvl}`);
  const shComps = (deg) => (deg === 0 ? 0 : deg === 1 ? 9 : 24);

  const out = new ArrayBuffer(totalSplats * 32);
  const fv = new Float32Array(out), bv = new Uint8Array(out);
  const clamp255 = (x) => Math.max(0, Math.min(255, Math.round(x)));

  let sectionBase = 4096 + maxSections * 1024;
  let o = 0; // global output splat index
  for (let s = 0; s < sections && o < totalSplats; s++) {
    const su32 = new Uint32Array(data, 4096 + s * 1024, 256);
    const sf32 = new Float32Array(data, 4096 + s * 1024, 256);
    const su16 = new Uint16Array(data, 4096 + s * 1024, 512);
    const maxSplat = su32[1];
    const bucketSize = su32[2];
    const bucketCount = su32[3];
    const bucketBlockSize = sf32[4];
    const bucketBytes = su16[10];
    const csr = su32[6] || L.scaleRange;
    const fullBuckets = su32[8];
    const partBuckets = su32[9];
    const shDeg = su16[20];
    const comps = shComps(shDeg);
    const bytesPerSplat = L.bytes(comps);
    const metaBytes = partBuckets * 4;
    const partLens = new Uint32Array(data, sectionBase, partBuckets);
    const buckets = new Float32Array(
      data, sectionBase + metaBytes, (bucketBytes * bucketCount) >> 2);
    const dataBase = sectionBase + metaBytes + bucketBytes * bucketCount;
    const csf = (bucketBlockSize / 2) / csr;
    const nHere = Math.min(maxSplat, totalSplats - o);

    // bucket index per local splat: full buckets first, then the
    // partially-filled tail (SplatBuffer.getBucketIndex).
    let tailStart = fullBuckets * bucketSize;
    let tailBucket = fullBuckets, tailIdx = 0, tailEnd = tailStart +
      (partBuckets ? partLens[0] : 0);

    const dv = new DataView(data);
    for (let i = 0; i < nHere; i++, o++) {
      const base = dataBase + i * bytesPerSplat;
      let x, y, z;
      if (lvl === 0) {
        x = dv.getFloat32(base, true);
        y = dv.getFloat32(base + 4, true);
        z = dv.getFloat32(base + 8, true);
      } else {
        let b;
        if (i < tailStart) b = (i / bucketSize) | 0;
        else {
          while (i >= tailEnd && tailIdx + 1 < partBuckets) {
            tailBucket++; tailIdx++;
            tailEnd += partLens[tailIdx];
          }
          b = tailBucket;
        }
        x = (dv.getUint16(base, true) - csr) * csf + buckets[b * 3];
        y = (dv.getUint16(base + 2, true) - csr) * csf + buckets[b * 3 + 1];
        z = (dv.getUint16(base + 4, true) - csr) * csf + buckets[b * 3 + 2];
      }
      fv[o * 8] = x; fv[o * 8 + 1] = y; fv[o * 8 + 2] = z;
      // scale (floats 0-2) + rotation (floats 3-6, w first) share one view
      // base at scaleOff (SplatBuffer.getSplatScaleAndRotation).
      const sb = base + L.scaleOff;
      const rd = lvl === 0
        ? (j) => dv.getFloat32(sb + j * 4, true)
        : (j) => halfToFloat(dv.getUint16(sb + j * 2, true));
      fv[o * 8 + 3] = rd(0); fv[o * 8 + 4] = rd(1); fv[o * 8 + 5] = rd(2);
      const q = [rd(3), rd(4), rd(5), rd(6)]; // (w, x, y, z)
      const ql = Math.hypot(q[0], q[1], q[2], q[3]) || 1;
      for (let k = 0; k < 4; k++)
        bv[o * 32 + 28 + k] = clamp255((q[k] / ql) * 128 + 128);
      for (let k = 0; k < 4; k++)
        bv[o * 32 + 24 + k] = dv.getUint8(base + L.colorOff + k);
    }
    sectionBase += bytesPerSplat * maxSplat + metaBytes +
      bucketBytes * bucketCount;
  }
  return out;
}

/* -- minimal column-major mat4 helpers ----------------------------------- */
function lookAt(eye, at, up) {
  const sub = (a, b) => [a[0]-b[0], a[1]-b[1], a[2]-b[2]];
  const norm = (v) => { const l = Math.hypot(...v); return v.map(x => x/l); };
  const cross = (a, b) => [a[1]*b[2]-a[2]*b[1], a[2]*b[0]-a[0]*b[2],
                           a[0]*b[1]-a[1]*b[0]];
  const dot = (a, b) => a[0]*b[0] + a[1]*b[1] + a[2]*b[2];
  const z = norm(sub(eye, at));           // camera looks down -z
  const x = norm(cross(up, z));
  const y = cross(z, x);
  return new Float32Array([
    x[0], y[0], z[0], 0,
    x[1], y[1], z[1], 0,
    x[2], y[2], z[2], 0,
    -dot(x, eye), -dot(y, eye), -dot(z, eye), 1,
  ]);
}

function perspective(fovy, aspect, near, far) {
  const f = 1 / Math.tan(fovy / 2), nf = 1 / (near - far);
  return new Float32Array([
    f / aspect, 0, 0, 0,
    0, -f, 0, 0,                          // y-down image convention
    0, 0, (far + near) * nf, -1,
    0, 0, 2 * far * near * nf, 0,
  ]);
}
