"""Browser frontend for the interactive editing session.

The reference ships a PyQt5 desktop app (ui_demo.py; Qt layout ui/ui.py) —
no GUI toolkit exists in the TPU serving image, so the equivalent here is a
single-page browser UI served by ``cli/serve.py`` over the same
InteractiveSession the headless API uses.  Workflow parity with
ui_demo.py:27-275: load densepose -> shape text -> generate parsing ->
brush-edit the parsing map (class palette identical to
sample_model.py:388-395; class ids per ui_demo.py:181-250) -> texture text ->
generate.  Strokes are undoable like the reference GraphicsScene
(ui/mouse_event.py:90-129).

Stdlib-only on the server side; the page is vanilla JS (no CDN — the serving
host may be airgapped).
"""

from __future__ import annotations

# class id -> button label (reference ui_demo.py:181-250 *_mode handlers)
CLASS_NAMES = [
    "background",   # 0
    "top",          # 1
    "outer",        # 2
    "skirt",        # 3
    "dress",        # 4
    "pants",        # 5
    "leggings",     # 6
    "headwear",     # 7
    "eyeglass",     # 8
    "neckwear",     # 9
    "belt",         # 10
    "footwear",     # 11
    "bag",          # 12
    "hair",         # 13
    "face",         # 14
    "skin",         # 15
    "ring",         # 16
    "wrist wearing",# 17
    "socks",        # 18
    "gloves",       # 19
    "necklace",     # 20
    "rompers",      # 21
    "earstuds",     # 22
    "tie",          # 23
]

INDEX_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Text2Human</title>
<style>
  :root { color-scheme: light dark; }
  body { font-family: system-ui, sans-serif; margin: 1.2rem; max-width: 1100px; }
  h1 { font-size: 1.25rem; margin: 0 0 .75rem 0; }
  .row { display: flex; gap: 1rem; flex-wrap: wrap; align-items: flex-start; }
  .panel { border: 1px solid #8884; border-radius: 8px; padding: .8rem; }
  .panel h2 { font-size: .95rem; margin: 0 0 .5rem 0; }
  canvas, img.stage { border: 1px solid #8886; border-radius: 4px;
                      image-rendering: pixelated; background: #0001; }
  label { font-size: .85rem; display: block; margin-top: .4rem; }
  input[type=text] { width: 100%; box-sizing: border-box; padding: .35rem; }
  button { margin: .25rem .25rem 0 0; padding: .35rem .7rem; cursor: pointer; }
  #classes { display: grid; grid-template-columns: repeat(2, 1fr); gap: 2px;
             max-height: 330px; overflow-y: auto; }
  #classes button { display: flex; align-items: center; gap: .4rem;
                    font-size: .78rem; margin: 0; padding: .2rem .4rem; }
  #classes button.active { outline: 2px solid #07f; }
  .swatch { width: .9rem; height: .9rem; border-radius: 2px; display: inline-block;
            border: 1px solid #0003; flex: none; }
  #status { font-size: .85rem; min-height: 1.2em; margin-top: .6rem; opacity: .8; }
  .busy { color: #d80; } .err { color: #d22; }
</style>
</head>
<body>
<h1>Text2Human — interactive demo</h1>
<div class="row">
  <div class="panel" style="width:260px">
    <h2>1 · Pose &amp; shape text</h2>
    <label>DensePose PNG (IUV)
      <input type="file" id="pose_file" accept="image/png">
    </label>
    <button id="random_pose">Use synthetic pose</button>
    <label>Shape description
      <input type="text" id="shape_text"
             value="a lady, short-sleeve T-shirt, long pants">
    </label>
    <button id="gen_parsing">Generate parsing</button>
    <h2 style="margin-top:.9rem">3 · Texture text</h2>
    <label>Texture description
      <input type="text" id="texture_text" value="pure color, denim">
    </label>
    <label>Sample steps <input type="text" id="steps" value="" placeholder="default"></label>
    <button id="gen_human">Generate human</button>
    <div id="status"></div>
  </div>
  <div class="panel">
    <h2>2 · Parsing (click/drag to paint)</h2>
    <canvas id="parsing" width="256" height="512"></canvas>
    <div>
      <!-- odd sizes only: the server brush paints a side-(2*(b//2)+1)
           square (ui/session.py paint), so an even preview would commit
           one row/column larger than what the user drew -->
      <label>Brush <input type="range" id="brush" min="1" max="31" step="2" value="9" style="width:120px"></label>
      <button id="undo">Undo stroke</button>
    </div>
  </div>
  <div class="panel" style="width:240px">
    <h2>Brush class</h2>
    <div id="classes"></div>
  </div>
  <div class="panel">
    <h2>Result</h2>
    <img class="stage" id="result" width="256" height="512" alt="generated image">
  </div>
</div>
<script>
const PALETTE = __PALETTE__;
const CLASS_NAMES = __CLASS_NAMES__;
let cls = 1, drawing = false, stroke = [], mapH = 512, mapW = 256;
const canvas = document.getElementById('parsing');
const ctx = canvas.getContext('2d');
const status = document.getElementById('status');

function setStatus(msg, kind) {
  status.textContent = msg; status.className = kind || '';
}
async function api(path, body) {
  setStatus('working…', 'busy');
  let r, j;
  try {
    r = await fetch(path, {method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body || {})});
    j = await r.json();
  } catch (e) {
    // network failure / server restart / truncated body: without this the
    // status stays 'working…' forever and the rejection goes unhandled
    setStatus('request failed: ' + e.message, 'err');
    throw e;
  }
  if (!r.ok) { setStatus(j.error || r.statusText, 'err'); throw new Error(j.error); }
  setStatus('');
  return j;
}
let parsingSeq = 0;
function showParsing(b64) {
  // seq guard: image decode is async, so a stale response must not
  // overwrite a newer parsing map already on the canvas
  const seq = ++parsingSeq;
  const img = new Image();
  img.onload = () => { if (seq !== parsingSeq) return;
    mapW = img.width; mapH = img.height;
    canvas.width = img.width; canvas.height = img.height;
    ctx.imageSmoothingEnabled = false;
    ctx.drawImage(img, 0, 0); };
  img.src = 'data:image/png;base64,' + b64;
}
function bytesToB64(bytes) {
  // chunked: String.fromCharCode(...bytes) blows the argument limit on
  // real-size PNGs (>~64k)
  let s = '';
  for (let i = 0; i < bytes.length; i += 0x8000)
    s += String.fromCharCode.apply(null, bytes.subarray(i, i + 0x8000));
  return btoa(s);
}
// class buttons
const holder = document.getElementById('classes');
CLASS_NAMES.forEach((name, i) => {
  const b = document.createElement('button');
  const sw = document.createElement('span');
  sw.className = 'swatch';
  sw.style.background = `rgb(${PALETTE[i][0]},${PALETTE[i][1]},${PALETTE[i][2]})`;
  b.appendChild(sw); b.appendChild(document.createTextNode(name));
  if (i === cls) b.classList.add('active');
  b.onclick = () => { cls = i;
    holder.querySelectorAll('button').forEach(x => x.classList.remove('active'));
    b.classList.add('active'); };
  holder.appendChild(b);
});
// painting: collect (y, x) points, send one stroke per mouseup
function canvasPoint(ev) {
  const r = canvas.getBoundingClientRect();
  const x = Math.round((ev.clientX - r.left) * mapW / r.width);
  const y = Math.round((ev.clientY - r.top) * mapH / r.height);
  return [y, x];
}
function paintLocal(y, x) {
  // match the server geometry exactly: side 2*(b>>1)+1 centered on (x, y)
  const b = +document.getElementById('brush').value, r0 = b >> 1;
  const c = PALETTE[cls];
  ctx.fillStyle = `rgb(${c[0]},${c[1]},${c[2]})`;
  ctx.fillRect(x - r0, y - r0, 2 * r0 + 1, 2 * r0 + 1);
}
let strokeBackup = null;  // canvas snapshot for reverting a failed stroke
canvas.addEventListener('mousedown', ev => { drawing = true; stroke = [];
  strokeBackup = ctx.getImageData(0, 0, canvas.width, canvas.height);
  const [y, x] = canvasPoint(ev); stroke.push([y, x]); paintLocal(y, x); });
canvas.addEventListener('mousemove', ev => { if (!drawing) return;
  const [y, x] = canvasPoint(ev); stroke.push([y, x]); paintLocal(y, x); });
window.addEventListener('mouseup', async () => {
  if (!drawing) return; drawing = false;
  if (!stroke.length) return;
  try {
    const j = await api('/session/paint', {cls_id: cls, points: stroke,
      brush: +document.getElementById('brush').value});
    showParsing(j.parsing_png_b64);
  } catch (e) {
    // the stroke never registered server-side (paint-before-parsing 400,
    // network error): revert the optimistic local paint so the canvas
    // matches the server's map
    if (strokeBackup) ctx.putImageData(strokeBackup, 0, 0);
  }
});
// buttons
document.getElementById('random_pose').onclick = async () => {
  await api('/session/pose', {});
  setStatus('synthetic pose loaded');
};
document.getElementById('pose_file').onchange = async ev => {
  const f = ev.target.files[0]; if (!f) return;
  const b64 = bytesToB64(new Uint8Array(await f.arrayBuffer()));
  await api('/session/pose', {pose_png_b64: b64});
  setStatus('pose loaded');
};
document.getElementById('gen_parsing').onclick = async () => {
  const j = await api('/session/parsing',
    {shape_text: document.getElementById('shape_text').value});
  showParsing(j.parsing_png_b64);
};
document.getElementById('undo').onclick = async () => {
  const j = await api('/session/undo', {});
  // the server returns the (unchanged) map with ok=false when the stroke
  // history is empty — keying on the image alone would silently pretend
  // an undo happened
  if (j.parsing_png_b64) showParsing(j.parsing_png_b64);
  if (!j.ok) setStatus('nothing to undo');
};
document.getElementById('gen_human').onclick = async () => {
  const steps = +document.getElementById('steps').value || 0;
  const j = await api('/session/generate',
    {texture_text: document.getElementById('texture_text').value,
     sample_steps: steps});
  const img = document.getElementById('result');
  img.src = 'data:image/png;base64,' + j.image_png_b64;
  img.width = mapW; img.height = mapH;
};
</script>
</body>
</html>
"""


def index_html() -> str:
    """Render the page with the palette/class tables injected."""
    import json

    from text2human_tpu.ui.session import PALETTE

    return INDEX_HTML.replace("__PALETTE__", json.dumps(PALETTE)).replace(
        "__CLASS_NAMES__", json.dumps(CLASS_NAMES)
    )
