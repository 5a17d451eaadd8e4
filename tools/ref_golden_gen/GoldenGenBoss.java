// BOSS word/bag golden: run the reference BOSS.createWords +
// createBagOfPattern on CBF and print packed words + numerosity-reduced
// bags (the A1/A2/P4 pipeline) as JSON.
import sfa.timeseries.TimeSeries;
import sfa.timeseries.TimeSeriesLoader;
import sfa.transformation.BOSS;

import java.io.File;
import java.util.Arrays;

public class GoldenGenBoss {
    public static void main(String[] args) throws Exception {
        String fix = args[0];
        TimeSeries[] all = TimeSeriesLoader.loadDataset(new File(fix + "/CBF_TRAIN"));
        TimeSeries[] train = Arrays.copyOfRange(all, 0, 12);
        int maxF = 16, maxS = 4, window = 32, f = 8;
        StringBuilder sb = new StringBuilder("{");
        for (boolean normMean : new boolean[]{true, false}) {
            BOSS boss = new BOSS(maxF, maxS, window, normMean);
            int[][] words = boss.createWords(train);
            BOSS.BagOfPattern[] bags = boss.createBagOfPattern(words, train, f);
            sb.append("\"boss_norm" + normMean + "\": {\"words\": [");
            for (int i = 0; i < words.length; i++) {
                if (i > 0) sb.append(",");
                sb.append(Arrays.toString(words[i]));
            }
            sb.append("], \"bags\": [");
            for (int i = 0; i < bags.length; i++) {
                if (i > 0) sb.append(",");
                sb.append("[");
                int[][] ent = bags[i].bag.entries();
                for (int j = 0; j < ent.length; j++) {
                    if (j > 0) sb.append(",");
                    sb.append("[" + ent[j][0] + "," + ent[j][1] + "]");
                }
                sb.append("]");
            }
            sb.append("]}");
            sb.append(normMean ? "," : "");
        }
        sb.append("}");
        System.out.println(sb.toString());
        System.exit(0); // ParallelFor pool threads are non-daemon
    }
}
